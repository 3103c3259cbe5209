package graft

import org.apache.spark.sql.functions.col

/** O(Δ) value-state path for chained GLOBAL aggregates (r10,
  * streaming/ValueStateAgg.scala): count/sum/avg epochs fold the delta
  * into exact accumulators instead of re-scanning the base state —
  * diffed against batch recomputes through growth / retraction / mixed
  * epochs, null-handling edges, HAVING threshold crossings, a stacked
  * downstream consumer, a restart (state recovered from the committed
  * `_aggstate` epoch sidecar), and a listener-asserted O(Δ) read bound.
  */
class ValueStateAggSpec extends SparkSpecBase {

  private val aggSql =
    """SELECT CAST(count(*) AS BIGINT) AS n, CAST(count(v) AS BIGINT) AS nv,
      |  sum(v) AS s, avg(v) AS a,
      |  sum(CAST(v AS DECIMAL(12,2))) AS sd FROM vst""".stripMargin

  private def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(col): _*).collect().map(_.toString).toSeq.sorted
  }

  private def check(e: Engine, name: String, sql: String, when: String): Unit = {
    val got = sortedRows(e.table(name))
    val want = sortedRows(e.execute(sql))
    assert(got == want, s"$name diverged from batch recompute $when\n" +
      s"got:  $got\nwant: $want")
  }

  test("global count/sum/avg/decimal-sum chain stays exact through mixed epochs") {
    val dir = tmpDir("vstate")
    val e = new Engine(spark, dir)
    e.execute("CREATE TABLE vst (k BIGINT PRIMARY KEY, v BIGINT)")
    e.execute("INSERT INTO vst VALUES (1, 10), (2, NULL), (3, 30), (4, 41)")
    e.execute("FLUSH")
    e.execute(s"CREATE MATERIALIZED VIEW vmv (PRIMARY KEY (n)) AS $aggSql")
    assert(e.streamingJob("vmv").nonEmpty, "global agg must chain")
    // stacked consumer: the value-state path must publish the same
    // retraction-complete U-/U+ pairs the recompute path does
    e.execute("CREATE MATERIALIZED VIEW vmv2 (PRIMARY KEY (n)) AS " +
      "SELECT n, s FROM vmv")
    e.execute("FLUSH")
    check(e, "vmv", aggSql, "after backfill")

    e.execute("INSERT INTO vst VALUES (5, NULL), (6, 7)") // growth + null
    e.execute("FLUSH")
    check(e, "vmv", aggSql, "after growth epoch")

    e.execute("UPDATE vst SET v = v + 100 WHERE k % 2 = 1") // U-/U+ pairs
    e.execute("DELETE FROM vst WHERE k = 4")
    e.execute("FLUSH")
    check(e, "vmv", aggSql, "after mixed update/delete epoch")
    check(e, "vmv2", "SELECT n, s FROM vmv", "stacked consumer")

    // drain every non-null v: sum/avg must go back to NULL exactly
    e.execute("UPDATE vst SET v = NULL WHERE v IS NOT NULL")
    e.execute("FLUSH")
    check(e, "vmv", aggSql, "after all-null epoch (null sum/avg)")
    assert(e.table("vmv").select("s").collect().head.isNullAt(0),
      "sum over zero non-null inputs must be NULL")

    e.execute("UPDATE vst SET v = k * 3 WHERE k <= 3") // nulls re-fill
    e.execute("FLUSH")
    check(e, "vmv", aggSql, "after refill epoch")

    // restart: a fresh engine recovers the folded state from the
    // committed _aggstate sidecar (no in-memory state) and keeps folding
    Seq("vmv2", "vmv").foreach(n => e.streamingJob(n).foreach(_.stop()))
    val e2 = new Engine(spark.newSession(), dir)
    e2.execute("INSERT INTO vst VALUES (7, 70), (8, NULL)")
    e2.execute("DELETE FROM vst WHERE k = 1")
    e2.execute("FLUSH")
    check(e2, "vmv", aggSql, "after restart epoch")
    check(e2, "vmv2", "SELECT n, s FROM vmv", "stacked consumer after restart")
    Seq("vmv2", "vmv").foreach(n => e2.streamingJob(n).foreach(_.stop()))
  }

  test("steady-state epoch is O(Δ): reads stay far below the base size") {
    val dir = tmpDir("vstateod")
    val e = new Engine(spark, dir)
    e.execute("CREATE TABLE vsb (k BIGINT PRIMARY KEY, v BIGINT)")
    e.execute("INSERT INTO vsb SELECT id, id * 2 FROM range(0, 5000)")
    e.execute("FLUSH")
    e.execute("CREATE MATERIALIZED VIEW vbmv (PRIMARY KEY (n)) AS " +
      "SELECT CAST(count(*) AS BIGINT) AS n, sum(v) AS s FROM vsb")
    e.execute("INSERT INTO vsb VALUES (900001, 1)") // warm epoch: bootstrap pass
    e.execute("FLUSH")
    val read = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        read.addAndGet(te.taskMetrics.inputMetrics.recordsRead)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      e.execute("INSERT INTO vsb VALUES (900002, 5)")
      e.execute("FLUSH")
      Thread.sleep(1500) // listener bus is async
      // the epoch folds a 1-row delta: the base table's own PK-merge
      // reads its touched bucket, the agg chain reads the delta + the
      // 1-row agg MV — never the 5k-row base state (the r9 recompute
      // read all of it every epoch)
      assert(read.get() < 2500,
        s"steady epoch read ${read.get()} records — smells like an " +
          "O(state) base re-scan")
    } finally spark.sparkContext.removeSparkListener(listener)
    check(e, "vbmv",
      "SELECT CAST(count(*) AS BIGINT) AS n, sum(v) AS s FROM vsb",
      "after O(Δ) epoch")
    Seq("vbmv").foreach(n => e.streamingJob(n).foreach(_.stop()))
  }

  test("HAVING over a global aggregate crosses the threshold both ways") {
    val dir = tmpDir("vstatehav")
    val e = new Engine(spark, dir)
    e.execute("CREATE TABLE vsh (k BIGINT PRIMARY KEY, v BIGINT)")
    e.execute("INSERT INTO vsh VALUES (1, 10), (2, 20)")
    e.execute("FLUSH")
    val sql = "SELECT CAST(count(*) AS BIGINT) AS n, sum(v) AS s " +
      "FROM vsh HAVING sum(v) > 50"
    e.execute(s"CREATE MATERIALIZED VIEW vhv (PRIMARY KEY (n)) AS $sql")
    e.execute("FLUSH")
    check(e, "vhv", sql, "below threshold (empty)")
    assert(e.table("vhv").isEmpty, "HAVING false: no row")

    e.execute("INSERT INTO vsh VALUES (3, 40)") // 70 > 50: row appears
    e.execute("FLUSH")
    check(e, "vhv", sql, "after crossing up")

    e.execute("DELETE FROM vsh WHERE k = 3") // back to 30: row retracts
    e.execute("FLUSH")
    check(e, "vhv", sql, "after crossing down")
    assert(e.table("vhv").isEmpty, "HAVING false again: row must retract")
    Seq("vhv").foreach(n => e.streamingJob(n).foreach(_.stop()))
  }
}
