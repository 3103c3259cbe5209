package graft

import org.apache.spark.sql.functions.col

/** O(Δ+g) value-state path for chained GROUPED aggregates (r11,
  * streaming/ValueStateAgg grouped section): per-group accumulators
  * folded from the epoch's insert/delete slices — diffed against batch
  * recomputes through growth / retraction / group-moving updates /
  * group deletion+rebirth, NULL group keys, HAVING threshold
  * crossings, a stacked downstream consumer, a restart (state
  * recovered from the committed `_aggstate` epoch sidecar), a
  * listener-asserted O(Δ+g) read bound, and the ADVICE-r10 subquery
  * disqualification.
  */
class GroupedValueStateAggSpec extends SparkSpecBase {

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

  /** The newest published epoch's `_aggstate` sidecar text, if any. */
  private def newestSidecar(dir: String, mv: String): Option[String] = {
    import java.nio.file.{Files, Paths}
    val log = Paths.get(s"$dir/$mv/data.changelog")
    if (!Files.exists(log)) return None
    FsList.list(log).iterator
      .flatMap(p => p.getFileName.toString.stripPrefix("batch-")
        .toLongOption.map(_ -> p))
      .toSeq.sortBy(-_._1).headOption
      .map(_._2.resolve("_aggstate"))
      .filter(Files.exists(_))
      .map(p => new String(Files.readAllBytes(p), "UTF-8"))
  }

  private val aggSql =
    """SELECT g, CAST(count(*) AS BIGINT) AS n, CAST(count(v) AS BIGINT) AS nv,
      |  sum(v) AS s, avg(v) AS a,
      |  sum(CAST(v AS DECIMAL(12,2))) AS sd FROM gvt GROUP BY g""".stripMargin

  test("grouped count/sum/avg/decimal-sum chain stays exact through mixed epochs") {
    val dir = tmpDir("gvstate")
    val e = new Engine(spark, dir)
    e.execute("CREATE TABLE gvt (k BIGINT PRIMARY KEY, g STRING, v BIGINT)")
    e.execute("INSERT INTO gvt VALUES (1, 'a', 10), (2, 'a', NULL), " +
      "(3, 'b', 30), (4, 'b', 41), (5, NULL, 7)") // NULL group key too
    e.execute("FLUSH")
    e.execute(s"CREATE MATERIALIZED VIEW gmv (PRIMARY KEY (g)) AS $aggSql")
    assert(e.streamingJob("gmv").nonEmpty, "grouped agg must chain")
    // stacked consumer: the grouped value-state path must publish the
    // same retraction-complete U-/U+ pairs the recompute path does
    e.execute("CREATE MATERIALIZED VIEW gmv2 (PRIMARY KEY (g)) AS " +
      "SELECT g, s FROM gmv")
    e.execute("FLUSH")
    check(e, "gmv", aggSql, "after backfill")

    e.execute("INSERT INTO gvt VALUES (6, 'c', 5), (7, 'a', NULL)") // new group
    e.execute("FLUSH")
    check(e, "gmv", aggSql, "after growth epoch")
    // the value-state path must actually FIRE: grouped sidecar committed
    assert(newestSidecar(dir, "gmv").exists(_.startsWith("g1")),
      "grouped epoch must commit a g1 _aggstate sidecar " +
        "(value-state path did not fire)")

    // group-moving update: rows LEAVE 'a' and ENTER 'b' in one epoch
    e.execute("UPDATE gvt SET g = 'b' WHERE k = 1")
    e.execute("UPDATE gvt SET v = v + 100 WHERE k = 3")
    e.execute("DELETE FROM gvt WHERE k = 4")
    e.execute("FLUSH")
    check(e, "gmv", aggSql, "after group-moving update epoch")
    check(e, "gmv2", "SELECT g, s FROM gmv", "stacked consumer")

    // delete group 'c' entirely: its aggregate row must retract
    e.execute("DELETE FROM gvt WHERE g = 'c'")
    e.execute("FLUSH")
    check(e, "gmv", aggSql, "after group deletion epoch")
    assert(!e.table("gmv").where("g = 'c'").collect().exists(_ => true),
      "emptied group must vanish from the aggregate MV")

    // rebirth with only-NULL v: n>0, s/a/sd NULL for that group
    e.execute("INSERT INTO gvt VALUES (8, 'c', NULL)")
    e.execute("FLUSH")
    check(e, "gmv", aggSql, "after group rebirth (all-null) epoch")

    // restart: a fresh engine recovers the folded per-group state from
    // the committed _aggstate sidecar and keeps folding
    Seq("gmv2", "gmv").foreach(n => e.streamingJob(n).foreach(_.stop()))
    val e2 = new Engine(spark.newSession(), dir)
    e2.execute("INSERT INTO gvt VALUES (9, 'b', 70), (10, NULL, NULL)")
    e2.execute("DELETE FROM gvt WHERE k = 2")
    e2.execute("FLUSH")
    check(e2, "gmv", aggSql, "after restart epoch")
    check(e2, "gmv2", "SELECT g, s FROM gmv", "stacked consumer after restart")
    Seq("gmv2", "gmv").foreach(n => e2.streamingJob(n).foreach(_.stop()))
  }

  test("steady grouped epoch is O(Δ+g): reads stay far below the base size") {
    val dir = tmpDir("gvstateod")
    val e = new Engine(spark, dir)
    e.execute("CREATE TABLE gvb (k BIGINT PRIMARY KEY, g BIGINT, v BIGINT)")
    // 5 groups × 1000 rows
    e.execute("INSERT INTO gvb SELECT id, id % 5, id * 2 FROM range(0, 5000)")
    e.execute("FLUSH")
    e.execute("CREATE MATERIALIZED VIEW gbmv (PRIMARY KEY (g)) AS " +
      "SELECT g, CAST(count(*) AS BIGINT) AS n, sum(v) AS s " +
      "FROM gvb GROUP BY g")
    e.execute("INSERT INTO gvb VALUES (900001, 1, 1)") // warm: bootstrap pass
    e.execute("FLUSH")
    assert(newestSidecar(dir, "gbmv").exists(_.startsWith("g1")),
      "grouped value-state path must fire on this shape")
    val read = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        read.addAndGet(te.taskMetrics.inputMetrics.recordsRead)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      e.execute("INSERT INTO gvb VALUES (900002, 2, 5)")
      e.execute("FLUSH")
      Thread.sleep(1500) // listener bus is async
      // the epoch folds a 1-row delta touching ONE group of 1000 base
      // rows: the base table's own PK-merge reads its touched bucket,
      // the agg chain reads the delta slices + the touched group's old
      // aggregate row — never the group's 1000-row base slice (the
      // touched-group recompute re-read it every epoch)
      assert(read.get() < 2500,
        s"steady grouped epoch read ${read.get()} records — smells like " +
          "a touched-group base re-read")
    } finally spark.sparkContext.removeSparkListener(listener)
    check(e, "gbmv",
      "SELECT g, CAST(count(*) AS BIGINT) AS n, sum(v) AS s " +
        "FROM gvb GROUP BY g",
      "after O(Δ+g) epoch")
    Seq("gbmv").foreach(n => e.streamingJob(n).foreach(_.stop()))
  }

  test("grouped HAVING crosses the threshold both ways per group") {
    val dir = tmpDir("gvstatehav")
    val e = new Engine(spark, dir)
    e.execute("CREATE TABLE gvh (k BIGINT PRIMARY KEY, g STRING, v BIGINT)")
    e.execute("INSERT INTO gvh VALUES (1, 'a', 10), (2, 'a', 20), (3, 'b', 60)")
    e.execute("FLUSH")
    val sql = "SELECT g, CAST(count(*) AS BIGINT) AS n, sum(v) AS s " +
      "FROM gvh GROUP BY g HAVING sum(v) > 50"
    e.execute(s"CREATE MATERIALIZED VIEW ghv (PRIMARY KEY (g)) AS $sql")
    e.execute("FLUSH")
    check(e, "ghv", sql, "initial (only b above threshold)")

    e.execute("INSERT INTO gvh VALUES (4, 'a', 40)") // a: 70 > 50 — appears
    e.execute("FLUSH")
    check(e, "ghv", sql, "after a crosses up")

    e.execute("DELETE FROM gvh WHERE k = 4") // a: back to 30 — retracts
    e.execute("FLUSH")
    check(e, "ghv", sql, "after a crosses down")
    assert(e.table("ghv").where("g = 'a'").isEmpty,
      "HAVING false again: group row must retract")
    Seq("ghv").foreach(n => e.streamingJob(n).foreach(_.stop()))
  }

  test("date-keyed groups render and fold exactly") {
    val dir = tmpDir("gvstatedate")
    val e = new Engine(spark, dir)
    e.execute("CREATE TABLE gvd (k BIGINT PRIMARY KEY, d DATE, v BIGINT)")
    e.execute("INSERT INTO gvd VALUES (1, DATE '2026-01-01', 5), " +
      "(2, DATE '2026-01-01', 6), (3, DATE '2026-01-02', 7)")
    e.execute("FLUSH")
    val sql = "SELECT d, CAST(count(*) AS BIGINT) AS n, sum(v) AS s " +
      "FROM gvd GROUP BY d"
    e.execute(s"CREATE MATERIALIZED VIEW gdv (PRIMARY KEY (d)) AS $sql")
    e.execute("INSERT INTO gvd VALUES (4, DATE '2026-01-03', 1)")
    e.execute("FLUSH")
    assert(newestSidecar(dir, "gdv").exists(_.startsWith("g1")),
      "date-keyed grouped value state must fire")
    e.execute("UPDATE gvd SET v = 50 WHERE k = 2")
    e.execute("DELETE FROM gvd WHERE k = 3")
    e.execute("FLUSH")
    check(e, "gdv", sql, "after date-keyed epochs")
    Seq("gdv").foreach(n => e.streamingJob(n).foreach(_.stop()))
  }

  test("a self-referencing subquery disqualifies the value-state fold (ADVICE r10)") {
    val dir = tmpDir("gvstatesub")
    val e = new Engine(spark, dir)
    e.execute("CREATE TABLE svt (k BIGINT PRIMARY KEY, v BIGINT)")
    e.execute("INSERT INTO svt VALUES (1, 10), (2, 20), (3, 90)")
    e.execute("FLUSH")
    // the per-epoch ±fold is NON-linear here: the subquery threshold is
    // re-evaluated per slice, so a value-state epoch would silently
    // publish wrong counts; the plan gate must route it to the
    // materialized-input recompute, which stays correct
    val sql = "SELECT CAST(count(*) AS BIGINT) AS n FROM svt " +
      "WHERE v > (SELECT avg(v) FROM svt)"
    e.execute(s"CREATE MATERIALIZED VIEW smv (PRIMARY KEY (n)) AS $sql")
    e.execute("FLUSH")
    check(e, "smv", sql, "after backfill")
    e.execute("INSERT INTO svt VALUES (4, 200)") // avg moves: 30 → 80
    e.execute("FLUSH")
    check(e, "smv", sql, "after threshold-moving insert")
    e.execute("DELETE FROM svt WHERE k = 3")
    e.execute("FLUSH")
    check(e, "smv", sql, "after threshold-moving delete")
    Seq("smv").foreach(n => e.streamingJob(n).foreach(_.stop()))
  }
}
