package graft

import java.nio.file.{Files, Paths, StandardCopyOption, StandardOpenOption}

import scala.util.Random

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Forked-JVM body of the crash-point recovery fuzz (CrashRecoverySpec).
  *
  * Runs seeded DML+chain scenarios against an Engine over a durable
  * warehouse. The parent launches this main twice per group: once with
  * `-Dgraft.crashpoint=<point>:<n>` armed (the JVM halts — kill -9
  * semantics — mid-commit at the n-th hit of that point), then again
  * unarmed: the second run must RECOVER (Engine construction replays the
  * WAL, streaming checkpoints replay their micro-batches), finish the
  * remaining statements exactly-once, and pass both oracles.
  *
  * Exactly-once statement resume: before issuing statement i the child
  * records `issue i <table-frontier>` in a progress log (synced writes);
  * after the statement returns it records `done i`. A statement is one
  * epoch on its target table, and an epoch's effects are atomic under
  * the WAL (journal → storage → publish, MaterializedView.merge), so on
  * restart a dangling `issue` resolves by comparing the recovered
  * frontier: advanced ⇒ the statement committed (replay only its model
  * mutation), unchanged ⇒ it was lost pre-journal (re-issue it). This is
  * the client-visible recovery contract: nothing is half-applied, and
  * nothing needs an idempotent retry.
  *
  * Oracles after the final FLUSH (same pair as DmlChainFuzzSpec):
  *   1. table contents vs an in-memory model replaying each committed
  *      statement's semantics from scratch;
  *   2. every chained MV vs a batch recompute of its defining query over
  *      the table's actual storage.
  *
  * Mode `evil-publish` proves the harness CAN fail: it fabricates the
  * exact state a reordered (publish-before-storage-rewrite) merge would
  * leave behind a crash — a changelog epoch whose rows never reached
  * table storage — then halts. The recovery run must DETECT the
  * divergence (exit 1), or the harness is toothless.
  *
  * Reference analog: src/tests/simulation/ (madsim kill/recovery tests).
  */
object CrashFuzzChild {

  private val Words = Vector("ash", "bay", "cod", "dew", "elm", "fog", "gum", "hay")
  private case class R3(g: Long, v: Long, text: String)

  private final class Scenario(seed: Int, e: Engine, outDir: String) {
    val t = s"cf_t_$seed"
    private val shape = seed % 3
    private val progress = Paths.get(outDir, s"progress-$seed")
    private val model = scala.collection.mutable.Map[Long, R3]()

    // (mvName, pkClause, definingSql) — shape picks which chain planners
    // (per-row, stacked agg, cardinality-changing explode) the crash lands in
    val mvDefs: Seq[(String, String, String)] = shape match {
      case 0 => Seq((s"cf_m_${seed}_0", "(g)",
        s"SELECT g, count(*) AS n, sum(v) AS sv FROM $t GROUP BY g"))
      case 1 => Seq(
        (s"cf_m_${seed}_0", "(id)", s"SELECT id, g, v, text FROM $t WHERE v % 3 <> 0"),
        (s"cf_m_${seed}_1", "(g)",
          s"SELECT g, count(*) AS n, sum(v) AS sv FROM cf_m_${seed}_0 GROUP BY g"))
      case _ => Seq((s"cf_m_${seed}_0", "(tok)",
        s"SELECT tok, count(*) AS n FROM $t " +
          "LATERAL VIEW explode(split(text, ' ')) x AS tok GROUP BY tok"))
    }

    /** Deterministic statement list: generation reads ONLY the seed (ids
      * from a deterministic counter), never runtime state, so a restarted
      * child regenerates the identical list and replays model mutations
      * for the prefix that committed before the crash.
      */
    val stmts: Vector[(String, () => Unit)] = {
      val r = new Random(seed * 7919 + 17)
      var nextId = 0L
      val insertedIds = scala.collection.mutable.ArrayBuffer[Long]()
      def freshId(): Long = { nextId += 1; nextId }
      Vector.fill(8) {
        r.nextInt(6) match {
          case 0 | 1 =>
            val rows = Seq.fill(1 + r.nextInt(3)) {
              val id = freshId(); insertedIds += id
              (id, R3(r.nextInt(3).toLong, r.nextInt(20).toLong,
                Seq.fill(1 + r.nextInt(3))(Words(r.nextInt(Words.length))).mkString(" ")))
            }
            (s"INSERT INTO $t VALUES " + rows.map { case (id, R3(g, v, tx)) =>
              s"($id, $g, $v, '$tx')" }.mkString(", "),
              () => rows.foreach { case (id, row) => model(id) = row })
          case 2 => // RELATIVE update — only atomic epochs make its replay exact
            val c = r.nextInt(3)
            (s"UPDATE $t SET v = v + 7 WHERE g = $c",
              () => model.mapValuesInPlace { case (_, row) =>
                if (row.g == c) row.copy(v = row.v + 7) else row })
          case 3 => // group-moving update
            (s"UPDATE $t SET g = (g + 1) % 3 WHERE v % 5 = 0",
              () => model.mapValuesInPlace { case (_, row) =>
                if (row.v % 5 == 0) row.copy(g = (row.g + 1) % 3) else row })
          case 4 if insertedIds.nonEmpty => // PK-changing update of one row
            val id = insertedIds(r.nextInt(insertedIds.length))
            (s"UPDATE $t SET id = id + 1000 WHERE id = $id",
              () => model.remove(id).foreach(row => model(id + 1000) = row))
          case 5 =>
            val m = 2 + r.nextInt(3); val c = r.nextInt(m)
            (s"DELETE FROM $t WHERE v % $m = $c",
              () => model.filterInPlace { case (_, row) => row.v % m != c })
          case _ =>
            val id = freshId(); insertedIds += id
            val row = R3(r.nextInt(3).toLong, r.nextInt(20).toLong, Words(r.nextInt(Words.length)))
            (s"INSERT INTO $t VALUES ($id, ${row.g}, ${row.v}, '${row.text}')",
              () => model(id) = row)
        }
      }
    }

    private def frontier: Long =
      e.mvs.get(t).map(_.latestChangelogBatchId).getOrElse(-1L)

    private def append(line: String): Unit =
      Files.write(progress, (line + "\n").getBytes("UTF-8"),
        StandardOpenOption.CREATE, StandardOpenOption.APPEND, StandardOpenOption.SYNC)

    private def ddl(sql: String): Unit =
      try { e.execute(sql); () } catch {
        case ex: Exception
          if ex.getMessage != null && ex.getMessage.contains("already exists") => ()
      }

    private var appliedCount = 0

    /** (Re)create the DDL surface, then resolve how many statements
      * committed before a crash and replay their model mutations.
      */
    def setup(): Unit = {
      ddl(s"CREATE TABLE $t (id BIGINT PRIMARY KEY, g BIGINT, v BIGINT, text STRING)")
      mvDefs.foreach { case (name, pk, sql) =>
        ddl(s"CREATE MATERIALIZED VIEW $name (PRIMARY KEY $pk) AS $sql")
      }
      var doneMax = -1
      var dangling: Option[(Int, Long)] = None
      if (Files.exists(progress))
        Files.readAllLines(progress).forEach { line =>
          line.split(" ") match {
            case Array("done", i) if i.toIntOption.nonEmpty =>
              doneMax = math.max(doneMax, i.toInt); dangling = None
            case Array("issue", i, f) if i.toIntOption.nonEmpty && f.toLongOption.nonEmpty =>
              dangling = Some((i.toInt, f.toLong))
            case _ => () // torn final line from the kill — ignore
          }
        }
      appliedCount = dangling match {
        case Some((i, f)) if i == doneMax + 1 =>
          // the epoch either committed atomically (frontier advanced —
          // possibly by the WAL replay just now) or vanished pre-journal
          if (frontier > f) i + 1 else i
        case _ => doneMax + 1
      }
      (0 until appliedCount).foreach(i => stmts(i)._2())
    }

    def step(i: Int): Unit = if (i >= appliedCount) {
      append(s"issue $i $frontier")
      e.execute(stmts(i)._1)
      stmts(i)._2()
      append(s"done $i")
    }

    private def sorted(df: org.apache.spark.sql.DataFrame): Seq[String] = {
      val cols = df.columns.sorted.toSeq
      df.select(cols.map(col): _*).collect().map(_.toString).toSeq.sorted
    }

    /** Run both oracles; record the outcome; return the failure if any. */
    def finalCheck(): Option[String] = {
      val spark = e.spark
      val errs = scala.collection.mutable.ArrayBuffer[String]()
      val got = e.table(t).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .toSeq.sorted
      val want = model.toSeq.map { case (id, R3(g, v, tx)) => (id, g, v, tx) }.sorted
      if (got != want)
        errs += s"seed $seed: table diverged from DML model\ngot:  $got\nwant: $want"
      mvDefs.foreach { case (name, _, sql) =>
        var oracle = sql
        (t +: mvDefs.map(_._1)).zipWithIndex.foreach { case (up, i) =>
          val view = s"__cfz_${seed}_$i"
          e.table(up).createOrReplaceTempView(view)
          oracle = oracle.replaceAll(
            "(?i)\\b" + java.util.regex.Pattern.quote(up) + "\\b", view)
        }
        val (g2, w2) = (sorted(e.table(name)), sorted(spark.sql(oracle)))
        if (g2 != w2)
          errs += s"seed $seed: $name diverged from batch recompute\n" +
            s"got:  $g2\nwant: $w2"
      }
      val verdict = if (errs.isEmpty) "OK" else errs.mkString("\n")
      Files.write(Paths.get(outDir, s"result-$seed"), verdict.getBytes("UTF-8"))
      if (errs.isEmpty) None else Some(verdict)
    }

    /** Fabricate the post-crash state of a merge that published BEFORE
      * rewriting storage: a changelog epoch whose rows are not in the
      * table — then halt. Recovery must flag the divergence.
      */
    def evilPublish(): Unit = {
      val spark = e.spark
      e.execute("FLUSH")
      val mv = e.mvs.get(t).get
      val epoch = mv.nextEpoch
      val stage = Paths.get(outDir, s"evil-stage-$seed")
      spark.range(1).select(
        lit(999999L).as("id"), lit(0L).as("g"), lit(55L).as("v"),
        lit("phantom").as("text"),
        lit(graft.streaming.Changelog.Insert).as(graft.streaming.Changelog.OpCol),
        lit(0L).as(graft.streaming.Changelog.SeqCol))
        .coalesce(1).write.mode("overwrite").parquet(stage.toString)
      Files.move(stage, Paths.get(mv.changelogLocation, s"batch-$epoch"),
        StandardCopyOption.ATOMIC_MOVE)
      System.err.println(s"CrashFuzzChild: evil publish fabricated at epoch $epoch")
      Runtime.getRuntime.halt(CrashPoints.ExitCode)
    }
  }

  def main(args: Array[String]): Unit = {
    val Array(warehouse, outDir, mode, seedsCsv) = args.take(4)
    val seeds = seedsCsv.split(",").map(_.trim.toInt).toSeq
    val spark = GraftSession.configure(
      SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .appName("graft-crashfuzz-child"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.init(spark)
    Files.createDirectories(Paths.get(outDir))
    // Engine construction = the recovery path under test: durable catalog
    // re-wire, WAL orphan replay, streaming checkpoint resume
    val e = new Engine(spark, warehouse)
    // every FLUSH below also runs a compaction cycle (snapshot checkpoint
    // + retention expiry) — the snapshot.* crash points land inside it,
    // and the oracles prove compaction never perturbs current state
    e.execute("SET changelog_snapshot_interval = 2")
    e.execute("SET changelog_retention_epochs = 1")
    val scens = seeds.map(new Scenario(_, e, outDir))
    scens.foreach(_.setup())
    if (mode == "evil-publish") scens.head.evilPublish() // halts the JVM
    val n = scens.map(_.stmts.length).max
    for (i <- 0 until n) {
      // interleaved round-robin: a crash lands mid-different-phases across
      // scenarios, and recovery must resume EACH from its own progress
      scens.foreach(_.step(i))
      if (i % 3 == 2) e.execute("FLUSH")
    }
    e.execute("FLUSH")
    val failures = scens.flatMap(_.finalCheck())
    failures.foreach(System.err.println)
    spark.stop()
    sys.exit(if (failures.isEmpty) 0 else 1)
  }
}
