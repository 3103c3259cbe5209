package graft

import java.lang.management.ManagementFactory
import java.nio.file.{Files, Paths}
import java.util.concurrent.{Executors, TimeUnit}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

/** Crash-point recovery fuzz — the madsim analog (reference:
  * src/tests/simulation/ kills nodes mid-epoch and asserts recovery
  * converges). Each group forks a real JVM (CrashFuzzChild) over a
  * durable warehouse with `-Dgraft.crashpoint=<point>:<n>` armed: the
  * n-th time the commit path crosses that point, the child halts —
  * kill -9 semantics, no shutdown hooks — somewhere between a journal
  * write, a bucket rewrite, a changelog rename, or an epoch-map entry.
  * A second unarmed fork then recovers the warehouse and must finish the
  * scenario exactly-once: table == independent DML model, every chained
  * MV == batch recompute (the oracles live in the child; this spec
  * checks exit codes and the per-seed result files).
  *
  * The harness proves it can fail: `evil-publish` mode fabricates the
  * state a reordered publish-before-storage merge would leave behind a
  * crash, and the recovery run MUST detect the divergence.
  */
class CrashRecoverySpec extends SparkSpecBase {
  import spark.implicits._

  private val Points = Seq(
    "wal.journal",     // before the delta journal exists → statement lost pre-ack
    "wal.journaled",   // journal committed, storage untouched
    "storage.buckets", // buckets rewritten, empty-bucket sweep pending
    "publish.rename",  // storage done, changelog rename pending
    "publish.done",    // fully committed, ack never delivered
    "epochmap.entry",  // micro-batch→epoch mapping durable, merge pending
    // FLUSH-time compaction (the child runs with snapshot_interval=2,
    // retention=1, so these fire on real checkpoint cycles):
    "snapshot.write",    // compaction chosen, snapshot tmp not yet written
    "snapshot.rename",   // snapshot staged, atomic rename pending
    "snapshot.compacted")// snapshot + expiry complete

  private val totalSeeds =
    sys.env.getOrElse("SPARK_GRAFT_CRASHFUZZ_N", "51").toInt
  private val PerGroup = 3

  /** Fork CrashFuzzChild with the parent's classpath and module opens. */
  private def fork(childArgs: Seq[String], crash: Option[String],
      logFile: java.nio.file.Path): Int = {
    val java = s"${System.getProperty("java.home")}/bin/java"
    val inherited = ManagementFactory.getRuntimeMXBean.getInputArguments.asScala
      .filterNot(a => a.startsWith("-Xmx") || a.startsWith("-agentlib") ||
        a.startsWith("-Dgraft.crashpoint"))
    val opts = inherited ++ Seq("-Xmx3g") ++
      crash.map(c => s"-Dgraft.crashpoint=$c")
    val cmd = (Seq(java) ++ opts ++
      Seq("-cp", System.getProperty("java.class.path"),
        "graft.CrashFuzzChild") ++ childArgs).asJava
    val pb = new ProcessBuilder(cmd)
    pb.redirectErrorStream(true)
    pb.redirectOutput(logFile.toFile)
    val p = pb.start()
    if (!p.waitFor(15, TimeUnit.MINUTES)) {
      p.destroyForcibly()
      fail(s"forked child timed out; log: $logFile")
    }
    p.exitValue()
  }

  private def logTail(p: java.nio.file.Path): String =
    if (!Files.exists(p)) "(no log)"
    else Files.readAllLines(p).asScala.takeRight(40).mkString("\n")

  private def runGroup(group: Int, seeds: Seq[Int]): Unit = {
    val base = Paths.get(tmpDir(s"crashfuzz$group"))
    val wh = base.resolve("wh").toString
    val out = base.resolve("out").toString
    Files.createDirectories(Paths.get(out))
    val point = Points(group % Points.length)
    val hits = 1 + (group * 5) % 17
    val args = Seq(wh, out, "run", seeds.mkString(","))
    val log1 = base.resolve("run1.log")
    val ec1 = fork(args, Some(s"$point:$hits"), log1)
    assert(ec1 == 0 || ec1 == CrashPoints.ExitCode,
      s"group $group ($point:$hits): armed run exited $ec1\n${logTail(log1)}")
    if (ec1 == CrashPoints.ExitCode) {
      val log2 = base.resolve("run2.log")
      val ec2 = fork(args, None, log2)
      assert(ec2 == 0,
        s"group $group ($point:$hits): recovery run exited $ec2\n${logTail(log2)}")
    }
    seeds.foreach { s =>
      val res = Paths.get(out, s"result-$s")
      assert(Files.exists(res), s"group $group: no result for seed $s")
      val verdict = new String(Files.readAllBytes(res), "UTF-8")
      assert(verdict == "OK",
        s"group $group ($point:$hits) seed $s diverged after recovery:\n$verdict")
    }
  }

  test(s"$totalSeeds seeded scenarios recover exactly-once from kill -9 mid-epoch") {
    val groups = (0 until (totalSeeds + PerGroup - 1) / PerGroup).map { g =>
      (g, (0 until PerGroup).map(i => 5000 + g * PerGroup + i)
        .take(totalSeeds - g * PerGroup))
    }
    val pool = Executors.newFixedThreadPool(4)
    try {
      val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val latch = new java.util.concurrent.CountDownLatch(groups.size)
      groups.foreach { case (g, seeds) =>
        pool.submit(new Runnable {
          def run(): Unit =
            try runGroup(g, seeds)
            catch { case t: Throwable => failures.add(t) }
            finally latch.countDown()
        })
      }
      latch.await(80, TimeUnit.MINUTES)
      failures.asScala.headOption.foreach(throw _)
    } finally pool.shutdownNow()
  }

  test("harness detects a deliberately-reordered publish (must fail)") {
    val base = Paths.get(tmpDir("crashfuzzevil"))
    val wh = base.resolve("wh").toString
    val out = base.resolve("out").toString
    Files.createDirectories(Paths.get(out))
    // seed 7000 % 3 == 1: the per-row chain applies delta rows directly,
    // the shape a phantom publication corrupts
    val args = Seq(wh, out, "evil-publish", "7000")
    val log1 = base.resolve("run1.log")
    val ec1 = fork(args, None, log1)
    assert(ec1 == CrashPoints.ExitCode,
      s"evil child should halt after fabricating, got $ec1\n${logTail(log1)}")
    val log2 = base.resolve("run2.log")
    val ec2 = fork(Seq(wh, out, "run", "7000"), None, log2)
    assert(ec2 == 1,
      s"recovery run over a reordered publish must FAIL its oracles, got $ec2\n" +
        logTail(log2))
    val verdict = new String(Files.readAllBytes(Paths.get(out, "result-7000")), "UTF-8")
    assert(verdict.contains("diverged"),
      s"expected a recompute divergence verdict, got:\n$verdict")
  }

  test("recoverWal finishes a journal stranded before publication") {
    import graft.streaming.{Changelog, MvCatalog}
    val dir = tmpDir("walrec")
    val cat = new MvCatalog(spark, dir)
    val mv = cat.define("w", Seq("k"), nBuckets = 4)
    mv.merge(Seq((1L, "a")).toDF("k", "x"), 0L)
    // fabricate a journaled-but-unpublished epoch 1 — the state a crash
    // leaves anywhere between journal commit and changelog rename
    val wal = s"$dir/w/data.wal/epoch-1"
    Seq((2L, "b")).toDF("k", "x")
      .withColumn(Changelog.OpCol, lit(Changelog.Insert))
      .withColumn(Changelog.SeqCol, lit(0L))
      .coalesce(1).write.parquet(wal)
    // re-attach: define() sweeps the WAL — epoch 1 must reach storage
    // AND the changelog, and the epoch allocator must move past it
    val mv2 = new MvCatalog(spark, dir).define("w", Seq("k"), nBuckets = 4)
    assert(mv2.latestChangelogBatchId == 1L)
    assert(!Files.exists(Paths.get(wal)))
    assert(mv2.read().orderBy("k").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b")))
    assert(mv2.nextEpoch == 2L)
  }
}
