package graft

/** Streaming global TopN chain: `CREATE MV … ORDER BY x LIMIT k`
  * maintains incrementally (reference: src/stream/src/executor/top_n/
  * top_n_plain.rs — the reference streams LIMIT; round 8 fenced it).
  * Exercises the boundary fast path, the pruned re-scan, the
  * delete-forced full refill, demotion of a top row by UPDATE, ties at
  * the boundary, and restart recovery.
  */
class StreamingTopNChainSpec extends SparkSpecBase {
  import spark.implicits._

  private val sql =
    "SELECT k, v, tag FROM tn ORDER BY v DESC, k LIMIT 3"

  private def got(e: Engine): Seq[(Long, Long)] =
    e.table("tmv").select("k", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted

  private def want(e: Engine): Seq[(Long, Long)] =
    e.execute(sql).select("k", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted

  test("ORDER BY … LIMIT chains: inserts, demotions, delete-refill, ties, restart") {
    val dir = tmpDir("topnchain")
    val e = new Engine(spark, dir)
    e.execute("CREATE TABLE tn (k BIGINT PRIMARY KEY, v BIGINT, tag STRING)")
    e.execute("INSERT INTO tn VALUES (1, 10, 'a'), (2, 50, 'b'), (3, 30, 'c'), " +
      "(4, 40, 'd'), (5, 20, 'e')")
    e.execute("FLUSH")
    val plan = e.execute("EXPLAIN CREATE MATERIALIZED VIEW tmv " +
      s"(PRIMARY KEY (k)) AS $sql").collect().map(_.getString(0))
    assert(plan.exists(_.contains("streaming top-3")), plan.toSeq)
    e.execute(s"CREATE MATERIALIZED VIEW tmv (PRIMARY KEY (k)) AS $sql")
    assert(e.streamingJob("tmv").nonEmpty,
      "ORDER BY … LIMIT must chain, not fence")
    e.execute("FLUSH")
    assert(got(e) == Seq(2L -> 50L, 3L -> 30L, 4L -> 40L))

    // below-boundary insert: the fast path publishes an empty epoch
    e.execute("INSERT INTO tn VALUES (6, 5, 'f')")
    e.execute("FLUSH")
    assert(got(e) == want(e) && got(e) == Seq(2L -> 50L, 3L -> 30L, 4L -> 40L))

    // boundary TIE (v = 30, k = 7 loses the tiebreak to k = 3): stays out
    e.execute("INSERT INTO tn VALUES (7, 30, 'g')")
    e.execute("FLUSH")
    assert(got(e) == want(e) && got(e) == Seq(2L -> 50L, 3L -> 30L, 4L -> 40L))

    // above-boundary insert enters, evicting the old 3rd
    e.execute("INSERT INTO tn VALUES (8, 45, 'h')")
    e.execute("FLUSH")
    assert(got(e) == want(e) && got(e) == Seq(2L -> 50L, 4L -> 40L, 8L -> 45L))

    // UPDATE demotes the current max below everything: refill from state
    e.execute("UPDATE tn SET v = 1 WHERE k = 2")
    e.execute("FLUSH")
    assert(got(e) == want(e) && got(e) == Seq(3L -> 30L, 4L -> 40L, 8L -> 45L))

    // DELETE two of the top three: the boundary region goes under k —
    // the full TakeOrdered refill promotes the tied 30s (3 wins over 7
    // on the tiebreak, both fit)
    e.execute("DELETE FROM tn WHERE k = 4 OR k = 8")
    e.execute("FLUSH")
    assert(got(e) == want(e) && got(e) == Seq(3L -> 30L, 5L -> 20L, 7L -> 30L))

    // restart: the chain re-wires from its topn: catalog entry
    e.streamingJob("tmv").foreach(_.stop())
    val e2 = new Engine(spark.newSession(), dir)
    assert(e2.streamingJob("tmv").nonEmpty, "recovery must re-wire the chain")
    e2.execute("INSERT INTO tn VALUES (9, 60, 'i')")
    e2.execute("UPDATE tn SET v = 2 WHERE k = 3")
    e2.execute("FLUSH")
    assert(e2.table("tmv").select("k", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted ==
      Seq(5L -> 20L, 7L -> 30L, 9L -> 60L))
    e2.streamingJob("tmv").foreach(_.stop())
  }

  test("filtered + computed-column top-n: WHERE and expressions ride the per-row replay") {
    val dir = tmpDir("topnfilter")
    val e = new Engine(spark, dir)
    e.execute("CREATE TABLE tf (k BIGINT PRIMARY KEY, v BIGINT, tag STRING)")
    e.execute("INSERT INTO tf VALUES (1, 10, 'a'), (2, 50, 'x'), (3, 30, 'a'), " +
      "(4, 40, 'b'), (5, 20, 'b')")
    e.execute("FLUSH")
    val q = "SELECT k, v * 2 AS dv, tag FROM tf WHERE tag <> 'x' " +
      "ORDER BY dv DESC, k LIMIT 2"
    e.execute(s"CREATE MATERIALIZED VIEW fmv (PRIMARY KEY (k)) AS $q")
    assert(e.streamingJob("fmv").nonEmpty,
      "filtered ORDER BY … LIMIT must chain, not fence")
    e.execute("FLUSH")
    def got = e.table("fmv").select("k", "dv").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    def want = e.execute(q).select("k", "dv").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(got == want && got == Seq(3L -> 60L, 4L -> 80L)) // 2 filtered out
    // a filtered-out row updates INTO the filter and takes the top
    e.execute("UPDATE tf SET tag = 'a' WHERE k = 2")
    e.execute("FLUSH")
    assert(got == want && got == Seq(2L -> 100L, 4L -> 80L))
    // the top row updates OUT of the filter: evicted, next-best refills
    e.execute("UPDATE tf SET tag = 'x' WHERE k = 2")
    e.execute("FLUSH")
    assert(got == want && got == Seq(3L -> 60L, 4L -> 80L))
    // computed sort key follows a value update
    e.execute("UPDATE tf SET v = 100 WHERE k = 5")
    e.execute("FLUSH")
    assert(got == want && got == Seq(4L -> 80L, 5L -> 200L))
    e.streamingJob("fmv").foreach(_.stop())
  }

  test("LIMIT k OFFSET o: the visible window slides as rows enter and leave above it") {
    val dir = tmpDir("topnoffset")
    val e = new Engine(spark, dir)
    e.execute("CREATE TABLE toff (k BIGINT PRIMARY KEY, v BIGINT)")
    e.execute("INSERT INTO toff VALUES (1, 10), (2, 50), (3, 30), (4, 40), (5, 20)")
    e.execute("FLUSH")
    val q = "SELECT k, v FROM toff ORDER BY v DESC, k LIMIT 2 OFFSET 1"
    e.execute(s"CREATE MATERIALIZED VIEW omv (PRIMARY KEY (k)) AS $q")
    assert(e.streamingJob("omv").nonEmpty, "LIMIT … OFFSET must chain")
    e.execute("FLUSH")
    def got = e.table("omv").select("k", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    def want = e.execute(q).select("k", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(got == want && got == Seq(3L -> 30L, 4L -> 40L)) // 50 hidden by offset
    // a new global max pushes everything down one: 50 becomes visible
    e.execute("INSERT INTO toff VALUES (6, 99)")
    e.execute("FLUSH")
    assert(got == want && got == Seq(2L -> 50L, 4L -> 40L))
    // deleting the hidden top row slides the window back up
    e.execute("DELETE FROM toff WHERE k = 6")
    e.execute("FLUSH")
    assert(got == want && got == Seq(3L -> 30L, 4L -> 40L))
    e.streamingJob("omv").foreach(_.stop())
  }

  test("top-n over a table smaller than k stays exact as it grows and shrinks") {
    val e = new Engine(spark, tmpDir("topnsmall"))
    e.execute("CREATE TABLE sm (k BIGINT PRIMARY KEY, v BIGINT)")
    e.execute("INSERT INTO sm VALUES (1, 100)")
    e.execute("FLUSH")
    e.execute("CREATE MATERIALIZED VIEW smv (PRIMARY KEY (k)) AS " +
      "SELECT k, v FROM sm ORDER BY v, k LIMIT 4")
    assert(e.streamingJob("smv").nonEmpty)
    e.execute("FLUSH")
    def rows = e.table("smv").select("k").as[Long].collect().toSet
    assert(rows == Set(1L))
    e.execute("INSERT INTO sm VALUES (2, 50), (3, 75)")
    e.execute("FLUSH")
    assert(rows == Set(1L, 2L, 3L)) // still under k: everything shows
    e.execute("DELETE FROM sm WHERE k = 1")
    e.execute("FLUSH")
    assert(rows == Set(2L, 3L))
    e.streamingJob("smv").foreach(_.stop())
  }

  test("LIMIT 1000 epochs publish O(changes), not the full top (r10)") {
    val dir = tmpDir("topn1k")
    val e = new Engine(spark, dir)
    e.execute("CREATE TABLE tn1k (k BIGINT PRIMARY KEY, v BIGINT)")
    e.execute("INSERT INTO tn1k SELECT id, id * 7 % 3000 FROM range(0, 3000)")
    e.execute("FLUSH")
    val sql1k = "SELECT k, v FROM tn1k ORDER BY v DESC, k LIMIT 1000"
    // k = 1000: the touched-top test takes the broadcast-semi-join arm
    // (the old literal OR-fold was a 1000-term predicate) and must
    // complete without analysis/codegen blowup
    e.execute(s"CREATE MATERIALIZED VIEW tmv1k (PRIMARY KEY (k)) AS $sql1k")
    assert(e.streamingJob("tmv1k").nonEmpty)
    e.execute("FLUSH")
    // one row enters the top: the published epoch must carry the DIFF
    // (1 U+ for the entering row + 1 U- for the evicted), not 1000+1000
    e.execute("INSERT INTO tn1k VALUES (900001, 999999)")
    e.execute("FLUSH")
    val gotRows = e.table("tmv1k").select("k", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val wantRows = e.execute(sql1k).select("k", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotRows == wantRows, "k=1000 chain diverged from batch")
    assert(gotRows.contains(900001L -> 999999L))
    val clog = {
      val hits = graft.FsList.walk(java.nio.file.Paths.get(dir))
        .filter(p => p.getFileName.toString == "data.changelog" &&
          p.getParent.getFileName.toString.contains("tmv1k") &&
          !p.getParent.getFileName.toString.contains("__base"))
      assert(hits.nonEmpty, "result changelog dir not found")
      hits.head
    }
    val newest = graft.FsList.list(clog)
      .flatMap(p => p.getFileName.toString.stripPrefix("batch-")
        .toLongOption.map(_ -> p))
      .maxBy(_._1)._2
    val published = spark.read.parquet(newest.toString).count()
    assert(published <= 4,
      s"touching epoch published $published rows — expected the O(changes) " +
        "diff, not the full top republication")
    e.streamingJob("tmv1k").foreach(_.stop())
  }

  test("boundary-region read prunes on the sort-clustered base (r10)") {
    import graft.streaming.MvCatalog
    import org.apache.spark.sql.functions.{col, lit}
    // small parquet row groups so bucket files carry MANY of them — the
    // unit the sort-clustered layout lets the region read skip (at real
    // scale files are GBs with 128 MB row groups; default-config local
    // files are single-row-group and unprunable by construction)
    val hc = spark.sparkContext.hadoopConfiguration
    val oldBlock = hc.get("parquet.block.size")
    hc.setInt("parquet.block.size", 16 * 1024)
    try {
      val cat = new MvCatalog(spark, tmpDir("topnprune"))
      // the TopN base layout: pk buckets, SORTED by the sort key within
      // each bucket file (what createChainedTopNMv now defines)
      val sorted = cat.define("tp_sorted", Seq("k"), nBuckets = 4,
        sortWithinBuckets = Seq("v"))
      val rows = spark.range(0, 60000).toDF("k")
        .withColumn("v", col("k") * 17 % 60000)
      sorted.merge(rows)
      def regionRead(mv: graft.streaming.MaterializedView): Long = {
        val read = new java.util.concurrent.atomic.AtomicLong
        val listener = new org.apache.spark.scheduler.SparkListener {
          override def onTaskEnd(
              te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
            read.addAndGet(te.taskMetrics.inputMetrics.recordsRead)
        }
        spark.sparkContext.addSparkListener(listener)
        try {
          // the IncrementalTopN boundary-region shape: first key ⪰ old
          // k-th (here the top-5 boundary of v DESC)
          val top = mv.read().where(col("v") >= lit(59995L))
            .orderBy(col("v").desc, col("k")).limit(5).collect()
          assert(top.length == 5)
          Thread.sleep(1500) // listener bus is async
          read.get()
        } finally spark.sparkContext.removeSparkListener(listener)
      }
      val prunedRead = regionRead(sorted)
      assert(prunedRead < 15000,
        s"region read over the sorted layout read $prunedRead of 60000 " +
          "records — row-group stats are not pruning")
    } finally {
      if (oldBlock == null) hc.unset("parquet.block.size")
      else hc.set("parquet.block.size", oldBlock)
    }
  }

  test("a qualified sort over a shadowed input column fences (exprId check)") {
    // ORDER BY sh.v resolves to the INPUT column v (added-missing, then
    // stripped by a top Project) while the OUTPUT carries an alias v =
    // x. A by-name sort-key check would chain this and IncrementalTopN
    // would silently order by the alias — the exprId check fences it
    // and the batch refresh keeps the input-column ordering (advice r9).
    val e = new Engine(spark, tmpDir("topnshadow"))
    e.execute("CREATE TABLE sh (k BIGINT PRIMARY KEY, x BIGINT, v BIGINT)")
    e.execute("INSERT INTO sh VALUES (1, 5, 30), (2, 9, 10), (3, 1, 20)")
    e.execute("FLUSH")
    val sql = "SELECT k, x AS v FROM sh ORDER BY sh.v LIMIT 2"
    e.execute(s"CREATE MATERIALIZED VIEW shmv (PRIMARY KEY (k)) AS $sql")
    assert(e.streamingJob("shmv").isEmpty,
      "shadowed sort column must take the batch-refresh fence")
    // batch semantics: ordered by INPUT v (10, 20) → rows 2 and 3,
    // output v carries x's values
    assert(e.table("shmv").select("k", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == Set(2L -> 9L, 3L -> 1L))
    // the unshadowed spelling (ORDER BY the output alias) still chains
    e.execute("CREATE MATERIALIZED VIEW shmv2 (PRIMARY KEY (k)) AS " +
      "SELECT k, x AS w FROM sh ORDER BY w LIMIT 2")
    assert(e.streamingJob("shmv2").nonEmpty,
      "an output-alias sort key must still chain")
    e.execute("FLUSH")
    assert(e.table("shmv2").select("k").as[Long].collect().toSet == Set(1L, 3L))
    e.streamingJob("shmv2").foreach(_.stop())
  }

  test("a session-window MV whose PK omits the window columns fences") {
    // PRIMARY KEY (bidder) over GROUP BY bidder, session_window(...)
    // would collapse a bidder's distinct session rows into one stored
    // row on merge — eligibility now requires the PK to STRICTLY
    // contain the plain group attrs (advice r9)
    val e = new Engine(spark, tmpDir("sesspk"))
    e.execute("CREATE TABLE sb (id BIGINT PRIMARY KEY, bidder BIGINT, " +
      "price BIGINT, dt TIMESTAMP)")
    e.execute("INSERT INTO sb VALUES " +
      "(1, 7, 10, TIMESTAMP '2024-01-01 01:00:00'), " +
      "(2, 7, 20, TIMESTAMP '2024-01-01 01:30:00'), " +
      "(3, 7, 30, TIMESTAMP '2024-01-01 05:00:00')") // two sessions
    e.execute("FLUSH")
    e.execute("CREATE MATERIALIZED VIEW sessbad (PRIMARY KEY (bidder)) AS " +
      "SELECT bidder, session_window(dt, '1 hour').start AS sess_start, " +
      "count(*) AS n FROM sb GROUP BY bidder, session_window(dt, '1 hour')")
    assert(e.streamingJob("sessbad").isEmpty,
      "session MV with a window-less PK must fence, not collapse sessions")
    // the correct PK spelling chains
    e.execute("CREATE MATERIALIZED VIEW sessok (PRIMARY KEY (bidder, sess_start)) AS " +
      "SELECT bidder, session_window(dt, '1 hour').start AS sess_start, " +
      "count(*) AS n FROM sb GROUP BY bidder, session_window(dt, '1 hour')")
    assert(e.streamingJob("sessok").nonEmpty, "windowed PK must chain")
    e.execute("INSERT INTO sb VALUES (4, 7, 40, TIMESTAMP '2024-01-01 05:15:00')")
    e.execute("FLUSH")
    assert(e.table("sessok").select("n").as[Long].collect().sorted.toSeq ==
      Seq(2L, 2L))
    e.streamingJob("sessok").foreach(_.stop())
  }
}
