package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions.col

/** Changelog compaction + snapshot checkpoints (reference: Hummock
  * checkpoint + compaction + vacuum — docs/dev/src/design/
  * state-store-overview.md, src/storage/compactor/,
  * src/meta/src/hummock/): periodic full-image snapshots bound the
  * changelog to O(table + retained epochs) and AS-OF reconstruction to
  * O(epochs-since-snapshot), while subscription cursors pin the epochs
  * they haven't consumed and time travel below the retention frontier
  * stays a loud error.
  */
class SnapshotCompactionSpec extends SparkSpecBase {

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select(col("k"), col("v")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("VACUUM checkpoints the image; AS-OF reads O(suffix) files after") {
    val e = new Engine(spark, tmpDir("compactv"))
    e.execute("CREATE TABLE ct (k BIGINT PRIMARY KEY, v BIGINT)")
    e.execute("INSERT INTO ct VALUES (1, 10), (2, 20)")     // epoch 0
    e.execute("UPDATE ct SET v = v + 1 WHERE k = 1")        // epoch 1
    e.execute("INSERT INTO ct VALUES (3, 30)")              // epoch 2
    e.execute("DELETE FROM ct WHERE k = 2")                 // epoch 3
    e.execute("FLUSH")
    val mv = e.mvs.get("ct").get
    val image3 = Set(1L -> 11L, 3L -> 30L)
    assert(rows(e.table("ct")) == image3)

    e.execute("VACUUM ct") // retention 0 → frontier = newest epoch (3)
    assert(mv.snapshotEpochs == Seq(3L))
    // current reads and the frontier image are untouched
    assert(rows(e.table("ct")) == image3)
    assert(rows(e.execute("SELECT * FROM ct FOR SYSTEM_TIME AS OF 3")) == image3)
    // the frontier image now reads from the snapshot ALONE — no history
    val files3 = mv.imageAt(3L).inputFiles
    assert(files3.nonEmpty && files3.forall(_.contains("snapshot-3")),
      s"expected snapshot-only read, got ${files3.toSeq}")
    // history below the snapshot is expired — loudly
    val ex = intercept[Exception](
      e.execute("SELECT * FROM ct FOR SYSTEM_TIME AS OF 1"))
    assert(ex.getMessage.contains("history expired"))
    // the CTAS/birth root files are folded in and gone
    import scala.jdk.CollectionConverters._
    assert(!Files.list(Paths.get(mv.changelogLocation)).iterator().asScala
      .exists(p => Files.isRegularFile(p) &&
        p.getFileName.toString.endsWith(".parquet")))

    // new epochs replay as a suffix over the snapshot: files read =
    // snapshot + exactly the 2 post-snapshot epoch dirs, never the
    // 4-epoch prefix
    e.execute("INSERT INTO ct VALUES (4, 40)")              // epoch 4
    e.execute("UPDATE ct SET v = 99 WHERE k = 3")           // epoch 5
    e.execute("FLUSH")
    val image5 = Set(1L -> 11L, 3L -> 99L, 4L -> 40L)
    assert(rows(e.execute("SELECT * FROM ct FOR SYSTEM_TIME AS OF 5")) == image5)
    val files5 = mv.imageAt(5L).inputFiles
    assert(files5.exists(_.contains("snapshot-3")))
    assert(files5.exists(_.contains("batch-4")) && files5.exists(_.contains("batch-5")))
    assert(!files5.exists(f => f.contains("batch-0") || f.contains("batch-1") ||
      f.contains("batch-2") || f.contains("batch-3")))
    // intermediate target between snapshot and frontier is exact too
    assert(rows(e.execute("SELECT * FROM ct FOR SYSTEM_TIME AS OF 4")) ==
      Set(1L -> 11L, 3L -> 30L, 4L -> 40L))

    // a second VACUUM is incremental: builds from snapshot-3 + suffix,
    // supersedes it
    e.execute("VACUUM ct")
    assert(mv.snapshotEpochs == Seq(5L))
    assert(rows(e.execute("SELECT * FROM ct FOR SYSTEM_TIME AS OF 5")) == image5)
    assert(rows(e.table("ct")) == image5)
  }

  test("unconsumed subscription cursors pin history; consumption releases it") {
    val e = new Engine(spark, tmpDir("compactc"))
    e.execute("CREATE TABLE cs (k BIGINT PRIMARY KEY, v BIGINT)")
    e.execute("CREATE SUBSCRIPTION csub FROM cs")
    e.execute("DECLARE cc SUBSCRIPTION CURSOR FOR csub SINCE begin()")
    e.execute("INSERT INTO cs VALUES (1, 1)")   // epoch 0
    e.execute("INSERT INTO cs VALUES (2, 2)")   // epoch 1
    e.execute("INSERT INTO cs VALUES (3, 3)")   // epoch 2
    e.execute("FLUSH")
    val mv = e.mvs.get("cs").get
    // cursor at begin() pins everything: VACUUM may not expire a thing
    e.execute("VACUUM cs")
    assert(mv.snapshotEpochs.isEmpty)
    assert(rows(e.execute("SELECT * FROM cs FOR SYSTEM_TIME AS OF 0")) ==
      Set(1L -> 1L))
    // consume one epoch: exactly that much becomes reclaimable
    val page = e.execute("FETCH 1 FROM cc")
    assert(page.count() == 1)
    e.execute("VACUUM cs")
    assert(mv.snapshotEpochs == Seq(0L))
    // the unconsumed epochs survived compaction and still FETCH exactly
    val rest = e.execute("FETCH ALL FROM cc")
      .select(col("k"), col("v")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rest == Set(2L -> 2L, 3L -> 3L))
    // fully consumed: the whole history may compact
    e.execute("VACUUM cs")
    assert(mv.snapshotEpochs == Seq(2L))
    assert(rows(e.table("cs")) == Set(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("FLUSH auto-compacts under the interval GUC; chained MV stays exact") {
    val e = new Engine(spark, tmpDir("compacta"))
    e.execute("SET changelog_snapshot_interval = 2")
    e.execute("SET changelog_retention_epochs = 1")
    e.execute("CREATE TABLE ca (k BIGINT PRIMARY KEY, g BIGINT, v BIGINT)")
    e.execute("CREATE MATERIALIZED VIEW ca_agg (PRIMARY KEY (g)) AS " +
      "SELECT g, count(*) AS n, sum(k) AS sk FROM ca GROUP BY g")
    (0 until 8).foreach { i =>
      e.execute(s"INSERT INTO ca VALUES ($i, ${i % 2}, ${i * 10})")
      e.execute("FLUSH")
    }
    e.execute("UPDATE ca SET g = 1 - g WHERE k >= 6")
    e.execute("DELETE FROM ca WHERE k = 0")
    e.execute("FLUSH")
    val mv = e.mvs.get("ca").get
    // compaction actually ran and retention holds ≥1 trailing epoch live
    assert(mv.snapshotEpochs.nonEmpty && mv.snapshotEpochs.lengthIs == 1)
    val snap = mv.latestSnapshotEpoch
    assert(snap < mv.latestChangelogBatchId)
    // the chained MV matches a batch recompute of its definition
    val got = e.table("ca_agg").select(col("g"), col("n"), col("sk"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    e.table("ca").createOrReplaceTempView("__ca_now")
    val want = spark.sql(
      "SELECT g, count(*) AS n, sum(k) AS sk FROM __ca_now GROUP BY g")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
    // time travel: exact at and above the snapshot, loud below it
    assert(rows(e.execute(
      s"SELECT * FROM ca FOR SYSTEM_TIME AS OF ${mv.latestChangelogBatchId}")) ==
      rows(e.table("ca")))
    val ex = intercept[Exception](
      e.execute(s"SELECT * FROM ca FOR SYSTEM_TIME AS OF ${snap - 1}"))
    assert(ex.getMessage.contains("history expired"))
  }

  test("background compaction fires on epoch publish with NO FLUSH; chained MV stays exact") {
    val e = new Engine(spark, tmpDir("compactbg"))
    e.execute("SET changelog_snapshot_interval = 2")
    e.execute("SET changelog_retention_epochs = 1")
    e.execute("CREATE TABLE bg (k BIGINT PRIMARY KEY, g BIGINT, v BIGINT)")
    e.execute("CREATE MATERIALIZED VIEW bg_agg (PRIMARY KEY (g)) AS " +
      "SELECT g, count(*) AS n, sum(v) AS sv FROM bg GROUP BY g")
    val mv = e.mvs.get("bg").get
    // a continuously-running store: DML epochs publish, NOTHING flushes
    (0 until 8).foreach(i =>
      e.execute(s"INSERT INTO bg VALUES ($i, ${i % 2}, ${i * 10})"))
    // the compactor is a background daemon — wait for it, bounded
    val deadline = System.currentTimeMillis() + 60000
    while (mv.snapshotEpochs.isEmpty && System.currentTimeMillis() < deadline)
      Thread.sleep(50)
    assert(mv.snapshotEpochs.nonEmpty,
      "changelog grew past the interval with no FLUSH and never compacted")
    // untended-growth bound: live epoch dirs above the snapshot stay
    // O(retained), not O(lifetime) — re-check after the last enqueue
    // settles (publications after the compaction keep the tail short)
    assert(mv.latestSnapshotEpoch >= mv.latestChangelogBatchId - 4,
      s"snapshot ${mv.latestSnapshotEpoch} lags latest " +
        s"${mv.latestChangelogBatchId} by more than interval+retention+1")
    // current reads exact; history below the frontier expired loudly
    assert(rows(e.table("bg")) ==
      (0 until 8).map(i => (i.toLong, i * 10L)).toSet)
    if (mv.latestSnapshotEpoch > 0) {
      val ex = intercept[Exception](e.execute(
        s"SELECT * FROM bg FOR SYSTEM_TIME AS OF ${mv.latestSnapshotEpoch - 1}"))
      assert(ex.getMessage.contains("history expired"))
    }
    // the chained subscriber was drained BEFORE every expiry: exact now
    e.execute("FLUSH")
    val got = e.table("bg_agg")
      .select(col("g"), col("n"), col("sv")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((0L, 4L, 120L), (1L, 4L, 160L)))
  }

  test("DEFAULT config compacts unattended: 64-epoch interval, no SET, no FLUSH") {
    // round-9 directive: changelog_snapshot_interval defaults to 64 (the
    // reference compacts by default) — an untended long-running MV under
    // stock config must not grow its changelog forever
    val e = new Engine(spark, tmpDir("compactdef"))
    e.execute("CREATE TABLE dg (k BIGINT PRIMARY KEY, v BIGINT)")
    val mv = e.mvs.get("dg").get
    // batched inserts, one epoch each, crossing the default interval
    (0 until 66).foreach(i => e.execute(s"INSERT INTO dg VALUES ($i, $i)"))
    val deadline = System.currentTimeMillis() + 120000
    while (mv.snapshotEpochs.isEmpty && System.currentTimeMillis() < deadline)
      Thread.sleep(100)
    assert(mv.snapshotEpochs.nonEmpty,
      "66 epochs under DEFAULT config never compacted")
    assert(rows(e.table("dg")) == (0 until 66).map(i => (i.toLong, i.toLong)).toSet)
  }

  test("retention fuzz: DML history under auto-compaction, AS-OF probes per epoch") {
    val e = new Engine(spark, tmpDir("compactf"))
    e.execute("SET changelog_snapshot_interval = 3")
    e.execute("SET changelog_retention_epochs = 2")
    e.execute("CREATE TABLE cf (k BIGINT PRIMARY KEY, v BIGINT)")
    val mv = e.mvs.get("cf").get
    val r = new scala.util.Random(4242)
    val images = scala.collection.mutable.Map[Long, Set[(Long, Long)]]()
    var nextK = 0L
    (0 until 24).foreach { i =>
      r.nextInt(4) match {
        case 0 | 1 =>
          nextK += 1
          e.execute(s"INSERT INTO cf VALUES ($nextK, ${r.nextInt(50)})")
        case 2 =>
          val m = 2 + r.nextInt(3)
          e.execute(s"UPDATE cf SET v = v + 100 WHERE k % $m = 0")
        case _ =>
          val m = 2 + r.nextInt(4)
          e.execute(s"DELETE FROM cf WHERE v % $m = 1")
      }
      images(mv.latestChangelogBatchId) = rows(e.table("cf"))
      if (i % 4 == 3) e.execute("FLUSH") // auto-compaction checkpoint
    }
    e.execute("FLUSH")
    // every epoch at or above the snapshot frontier reconstructs exactly;
    // everything below errors loudly — and at least one of each exists
    val frontier = mv.latestSnapshotEpoch
    assert(frontier > 0 && frontier < mv.latestChangelogBatchId)
    var exact = 0; var expired = 0
    images.toSeq.sortBy(_._1).foreach { case (ep, want) =>
      if (ep >= frontier) {
        assert(rows(e.execute(s"SELECT * FROM cf FOR SYSTEM_TIME AS OF $ep")) ==
          want, s"epoch $ep image diverged (frontier $frontier)")
        exact += 1
      } else {
        val ex = intercept[Exception](
          e.execute(s"SELECT * FROM cf FOR SYSTEM_TIME AS OF $ep"))
        assert(ex.getMessage.contains("history expired"))
        expired += 1
      }
    }
    assert(exact >= 3 && expired >= 3, s"weak fuzz: $exact exact / $expired expired")
  }

  test("birth and commit times persist across a warehouse copy") {
    val dir = tmpDir("compactw")
    val e = new Engine(spark, dir)
    e.execute("CREATE TABLE cw (PRIMARY KEY (k)) AS " +
      "SELECT CAST(id AS BIGINT) AS k, CAST(id AS BIGINT) AS v FROM range(2)")
    Thread.sleep(1100)
    val betweenMs = System.currentTimeMillis()
    val between = java.time.LocalDateTime
      .ofInstant(java.time.Instant.ofEpochMilli(betweenMs),
        java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
    Thread.sleep(1100)
    e.execute("INSERT INTO cw VALUES (10, 10)") // epoch 0
    e.execute("FLUSH")
    // copy the warehouse — every file mtime becomes "now"
    val copy = tmpDir("compactwcopy")
    import scala.jdk.CollectionConverters._
    val src = Paths.get(dir)
    Files.walk(src).iterator().asScala.toSeq.foreach { p =>
      val t = Paths.get(copy).resolve(src.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else Files.copy(p, t,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    val e2 = new Engine(spark, copy)
    // a timestamp between birth and epoch 0 still binds to the birth
    // image on the COPY — the persisted sidecars, not mtimes, decide
    assert(rows(e2.execute(
      s"SELECT * FROM cw FOR SYSTEM_TIME AS OF '$between'")) ==
      Set(0L -> 0L, 1L -> 1L))
    assert(rows(e2.execute("SELECT * FROM cw FOR SYSTEM_TIME AS OF 0")) ==
      Set(0L -> 0L, 1L -> 1L, 10L -> 10L))
    val mv2 = e2.mvs.get("cw").get
    assert(mv2.birthMs.exists(_ < betweenMs))
    assert(mv2.epochCommitTimes.forall(_._2 > betweenMs))
  }
}
