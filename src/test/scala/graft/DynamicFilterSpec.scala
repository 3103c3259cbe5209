package graft

import org.apache.spark.sql.functions._

import graft.streaming.{Changelog, DynamicFilter, MvCatalog}

/** Streaming dynamic filter: `l.v > (SELECT max(b) FROM r)` maintained
  * continuously — rows flip in/out of the result as the scalar moves
  * (reference: src/stream/src/executor/dynamic_filter.rs band re-scan).
  */
class DynamicFilterSpec extends SparkSpecBase {
  import spark.implicits._

  private def mkFilter(tag: String, op: String) = {
    val cat = new MvCatalog(spark, tmpDir(tag))
    val lhs = cat.define(s"${tag}_lhs", Seq("id"), nBuckets = 4)
    val res = cat.define(s"${tag}_res", Seq("id"), nBuckets = 4)
    new DynamicFilter(lhs, res, "v", op)
  // (see the SQL-level chain tests at the bottom of this suite)
  }

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    if (df.columns.isEmpty) Seq.empty // result MV not yet materialized
    else df.select("id").as[Long].collect().toSeq.sorted

  test("rows enter and leave the result as the threshold moves") {
    val f = mkFilter("dynf", ">")
    // no threshold yet: nothing qualifies (null scalar comparison)
    f.applyDelta(Seq((1L, 5.0), (2L, 15.0), (3L, 25.0)).toDF("id", "v"), None)
    assert(ids(f.read()).isEmpty)

    // threshold 10 → {15, 25}
    f.applyDelta(Seq.empty[(Long, Double)].toDF("id", "v"), Some(10.0))
    assert(ids(f.read()) == Seq(2L, 3L))

    // threshold rises to 20 → row 2 retracted
    f.applyDelta(Seq.empty[(Long, Double)].toDF("id", "v"), Some(20.0))
    assert(ids(f.read()) == Seq(3L))

    // threshold falls to 4 → rows 1 and 2 (re)enter
    f.applyDelta(Seq.empty[(Long, Double)].toDF("id", "v"), Some(4.0))
    assert(ids(f.read()) == Seq(1L, 2L, 3L))
    assert(f.currentThreshold.contains(4.0))
  }

  test("left-side deltas filter against the current threshold; deletes propagate") {
    val f = mkFilter("dynd", ">")
    f.applyDelta(Seq((1L, 5.0), (2L, 15.0)).toDF("id", "v"), Some(10.0))
    assert(ids(f.read()) == Seq(2L))

    // new rows: one qualifying, one not
    f.applyDelta(Seq((3L, 30.0), (4L, 2.0)).toDF("id", "v"), Some(10.0))
    assert(ids(f.read()) == Seq(2L, 3L))

    // delete a qualifying row from the left input
    f.applyDelta(Seq((2L, 15.0, Changelog.Delete))
      .toDF("id", "v", Changelog.OpCol), Some(10.0))
    assert(ids(f.read()) == Seq(3L))
  }

  test("mirrored comparators: <= requalifies on a rising threshold") {
    val f = mkFilter("dynle", "<=")
    f.applyDelta(Seq((1L, 5.0), (2L, 15.0), (3L, 25.0)).toDF("id", "v"), Some(5.0))
    assert(ids(f.read()) == Seq(1L)) // v <= 5
    f.applyDelta(Seq.empty[(Long, Double)].toDF("id", "v"), Some(15.0))
    assert(ids(f.read()) == Seq(1L, 2L)) // band (5,15] entered
    f.applyDelta(Seq.empty[(Long, Double)].toDF("id", "v"), Some(14.9))
    assert(ids(f.read()) == Seq(1L)) // 15 leaves again
  }

  test("temporal filter TTL: rows expire with retractions as now() advances") {
    // the reference's NOW()-relative temporal filter is a dynamic filter
    // whose RHS is the advancing clock (now - retention): rows age OUT of
    // the result with real retractions, newly-arrived rows pass
    // (reference: src/stream/src/executor/now.rs + dynamic_filter.rs)
    val f = mkFilter("dyntf", ">")
    val retention = 100.0
    def tick(now: Double, delta: org.apache.spark.sql.DataFrame) =
      f.applyDelta(delta, Some(now - retention))

    // t=100: three events at ts 10/60/95 — all younger than 100-100=0
    tick(100.0, Seq((1L, 10.0), (2L, 60.0), (3L, 95.0)).toDF("id", "v"))
    assert(ids(f.read()) == Seq(1L, 2L, 3L))

    // t=170: cutoff 70 → ts=10 and ts=60 expire (retracted), 95 survives
    tick(170.0, Seq.empty[(Long, Double)].toDF("id", "v"))
    assert(ids(f.read()) == Seq(3L))

    // t=220: a fresh event arrives, old one expires
    tick(220.0, Seq((4L, 215.0)).toDF("id", "v"))
    assert(ids(f.read()) == Seq(4L))
  }

  test("epoch mode: threshold commits atomically with the delta; replay " +
      "of a committed epoch ignores a moved RHS") {
    val cat = new MvCatalog(spark, tmpDir("dyne"))
    val lhs = cat.define("e_lhs", Seq("id"), nBuckets = 4)
    val res = cat.define("e_res", Seq("id"), nBuckets = 4)
    val f = new DynamicFilter(lhs, res, "v", ">")

    // epoch 0 commits threshold 10 with its delta → {15, 25}
    f.applyDelta(Seq((1L, 5.0), (2L, 15.0), (3L, 25.0)).toDF("id", "v"),
      Some(10.0), batchId = 0L)
    assert(ids(f.read()) == Seq(2L, 3L))
    assert(f.currentThreshold.contains(10.0))

    // kill/replay: foreachBatch re-runs epoch 0, but the RHS scalar has
    // moved to 20 in the meantime. The committed epoch must win — the
    // result and threshold stay exactly as epoch 0 published them, and
    // the 20-band flip is NOT applied out of order.
    f.applyDelta(Seq((1L, 5.0), (2L, 15.0), (3L, 25.0)).toDF("id", "v"),
      Some(20.0), batchId = 0L)
    assert(ids(f.read()) == Seq(2L, 3L))
    assert(f.currentThreshold.contains(10.0))

    // the move is applied by the NEXT epoch, once, consistently
    f.applyDelta(Seq.empty[(Long, Double)].toDF("id", "v"),
      Some(20.0), batchId = 1L)
    assert(ids(f.read()) == Seq(3L))
    assert(f.currentThreshold.contains(20.0))

    // a fresh instance over the same dirs recovers the epoch-committed
    // threshold (no side file exists in epoch mode)
    val f2 = new DynamicFilter(lhs, res, "v", ">")
    assert(f2.currentThreshold.contains(20.0))

    // an epoch whose RHS produced no value leaves the threshold at the
    // previous epoch's committed value; delta rows filter against it
    f2.applyDelta(Seq((4L, 30.0)).toDF("id", "v"), None, batchId = 2L)
    assert(f2.currentThreshold.contains(20.0))
    assert(ids(f2.read()) == Seq(3L, 4L)) // 30 > 20 qualifies
  }

  test("threshold state survives re-instantiation (recovery)") {
    val cat = new MvCatalog(spark, tmpDir("dynr"))
    val lhs = cat.define("r_lhs", Seq("id"), nBuckets = 4)
    val res = cat.define("r_res", Seq("id"), nBuckets = 4)
    val f1 = new DynamicFilter(lhs, res, "v", ">")
    f1.applyDelta(Seq((1L, 5.0), (2L, 15.0)).toDF("id", "v"), Some(10.0))

    val f2 = new DynamicFilter(lhs, res, "v", ">")
    assert(f2.currentThreshold.contains(10.0))
    // falling threshold after recovery still emits the band correctly
    f2.applyDelta(Seq.empty[(Long, Double)].toDF("id", "v"), Some(1.0))
    assert(ids(f2.read()) == Seq(1L, 2L))
  }

  // ---- SQL-level chain: `CREATE MV … WHERE col ⊙ (SELECT agg FROM r)`
  // maintains as a streaming dynamic filter (round 8; previously the
  // loud batch-refresh fence). The q102 class.

  private def dmvRows(e: Engine): Set[(Long, Long)] =
    e.table("dmv").select("k", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("SQL chain: scalar-subquery comparison maintains continuously, both sides live") {
    val dir = tmpDir("dynsql")
    val e = new Engine(spark, dir)
    e.execute("CREATE TABLE dfl (k BIGINT PRIMARY KEY, v BIGINT)")
    e.execute("CREATE TABLE dfr (rk BIGINT PRIMARY KEY, x BIGINT)")
    e.execute("INSERT INTO dfl VALUES (1, 10), (2, 20), (3, 30), (4, 40)")
    e.execute("INSERT INTO dfr VALUES (1, 25)")
    e.execute("FLUSH")
    val plan = e.execute("EXPLAIN CREATE MATERIALIZED VIEW dmv " +
      "(PRIMARY KEY (k)) AS SELECT k, v FROM dfl " +
      "WHERE v > (SELECT max(x) FROM dfr)").collect().map(_.getString(0))
    assert(plan.exists(_.contains("dynamic filter")), plan.toSeq)
    e.execute("CREATE MATERIALIZED VIEW dmv (PRIMARY KEY (k)) AS " +
      "SELECT k, v FROM dfl WHERE v > (SELECT max(x) FROM dfr)")
    assert(e.streamingJob("dmv").nonEmpty,
      "scalar-subquery comparison must chain, not fence")
    e.execute("FLUSH")
    assert(dmvRows(e) == Set(3L -> 30L, 4L -> 40L)) // backfill under t=25

    // threshold RISES: the swept band (25, 35] retracts k=3
    e.execute("INSERT INTO dfr VALUES (2, 35)")
    e.execute("FLUSH")
    assert(dmvRows(e) == Set(4L -> 40L))

    // left side moves under the standing threshold
    e.execute("INSERT INTO dfl VALUES (5, 36), (6, 5)")
    e.execute("UPDATE dfl SET v = 50 WHERE k = 2")
    e.execute("DELETE FROM dfl WHERE k = 4")
    e.execute("FLUSH")
    assert(dmvRows(e) == Set(5L -> 36L, 2L -> 50L))

    // threshold FALLS: the swept band re-qualifies
    e.execute("DELETE FROM dfr WHERE rk = 2")
    e.execute("FLUSH")
    assert(dmvRows(e) == Set(5L -> 36L, 2L -> 50L, 3L -> 30L))

    // rhs emptied: NULL scalar — a comparison with NULL is never true
    e.execute("DELETE FROM dfr WHERE rk = 1")
    e.execute("FLUSH")
    assert(dmvRows(e).isEmpty, "null scalar must retract everything")

    // scalar returns: everything above it re-enters
    e.execute("INSERT INTO dfr VALUES (3, 15)")
    e.execute("FLUSH")
    assert(dmvRows(e) == Set(2L -> 50L, 3L -> 30L, 5L -> 36L))

    // restart: recovery re-wires the chain; post-restart DML stays exact
    Seq("dmv").foreach(n => e.streamingJob(n).foreach(_.stop()))
    val e2 = new Engine(spark.newSession(), dir)
    e2.execute("INSERT INTO dfl VALUES (7, 16)")
    e2.execute("INSERT INTO dfr VALUES (4, 35)")
    e2.execute("FLUSH")
    assert(e2.table("dmv").select("k", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set(2L -> 50L, 5L -> 36L))
    Seq("dmv").foreach(n => e2.streamingJob(n).foreach(_.stop()))
  }

  test("SQL chain: IN / NOT IN grouped-HAVING subqueries maintain as dynamic-set filters") {
    val dir = tmpDir("dynset")
    val e = new Engine(spark, dir)
    e.execute("CREATE TABLE sfa (id BIGINT PRIMARY KEY, item STRING)")
    e.execute("CREATE TABLE sfb (bk BIGINT PRIMARY KEY, auction BIGINT)")
    e.execute("INSERT INTO sfa VALUES (1,'a'), (2,'b'), (3,'c')")
    e.execute("INSERT INTO sfb VALUES (10,1),(11,1),(12,1),(13,2)")
    e.execute("FLUSH")
    // the Nexmark q103 shape — previously the loud fence
    e.execute("CREATE MATERIALIZED VIEW smv (PRIMARY KEY (id)) AS " +
      "SELECT id, item FROM sfa WHERE id IN " +
      "(SELECT auction FROM sfb GROUP BY auction HAVING count(*) >= 2)")
    assert(e.streamingJob("smv").nonEmpty,
      "IN grouped-HAVING subquery must chain, not fence")
    e.execute("FLUSH")
    def rows(mv: String, eng: Engine = e): Set[Long] =
      eng.table(mv).select("id").collect().map(_.getLong(0)).toSet
    assert(rows("smv") == Set(1L)) // only auction 1 clears HAVING
    // a key ENTERS the set: its rows flip in
    e.execute("INSERT INTO sfb VALUES (14, 2)")
    e.execute("FLUSH")
    assert(rows("smv") == Set(1L, 2L))
    // a key LEAVES (count falls under the HAVING): its rows retract
    e.execute("DELETE FROM sfb WHERE bk = 10 OR bk = 11")
    e.execute("FLUSH")
    assert(rows("smv") == Set(2L))
    // left-side DML re-tests against the standing set
    e.execute("INSERT INTO sfa VALUES (4, 'd')")
    e.execute("UPDATE sfa SET item = 'bb' WHERE id = 2")
    e.execute("FLUSH")
    assert(rows("smv") == Set(2L))

    // NOT IN twin (q104) incl. SQL's null poisoning rule
    e.execute("CREATE TABLE sfc (ck BIGINT PRIMARY KEY, key BIGINT)")
    e.execute("INSERT INTO sfc VALUES (1, 2)")
    e.execute("FLUSH")
    e.execute("CREATE MATERIALIZED VIEW amv (PRIMARY KEY (id)) AS " +
      "SELECT id, item FROM sfa WHERE id NOT IN (SELECT key FROM sfc)")
    assert(e.streamingJob("amv").nonEmpty)
    e.execute("FLUSH")
    assert(rows("amv") == Set(1L, 3L, 4L))
    // a NULL inside the set: x NOT IN (…, NULL) is never true
    e.execute("INSERT INTO sfc VALUES (2, NULL)")
    e.execute("FLUSH")
    assert(rows("amv").isEmpty, "null in a NOT IN set must empty the result")
    // the NULL leaves and a real key arrives: membership recovers
    e.execute("DELETE FROM sfc WHERE ck = 2")
    e.execute("INSERT INTO sfc VALUES (3, 1)")
    e.execute("FLUSH")
    assert(rows("amv") == Set(3L, 4L))

    // restart: both chains re-wire from their dynset: entries
    Seq("smv", "amv").foreach(n => e.streamingJob(n).foreach(_.stop()))
    val e2 = new Engine(spark.newSession(), dir)
    e2.execute("INSERT INTO sfb VALUES (15, 4), (16, 4)")
    e2.execute("FLUSH")
    assert(rows("smv", e2) == Set(2L, 4L))
    assert(rows("amv", e2) == Set(3L, 4L))
    Seq("smv", "amv").foreach(n => e2.streamingJob(n).foreach(_.stop()))
  }

  test("SQL chain: flipped/aliased comparison and the <= comparator") {
    val dir = tmpDir("dynsql2")
    val e = new Engine(spark, dir)
    e.execute("CREATE TABLE gfl (k BIGINT PRIMARY KEY, price BIGINT, tag STRING)")
    e.execute("CREATE TABLE gfr (rk BIGINT PRIMARY KEY, x BIGINT)")
    e.execute("INSERT INTO gfl VALUES (1, 10, 'a'), (2, 20, 'b'), (3, 30, 'c')")
    e.execute("INSERT INTO gfr VALUES (1, 4), (2, 6)")
    e.execute("FLUSH")
    // scalar on the LEFT of the comparison (flips <= to >=), aliased
    // value column, avg scalar
    e.execute("CREATE MATERIALIZED VIEW gmv (PRIMARY KEY (k)) AS " +
      "SELECT k, price AS p, tag FROM gfl " +
      "WHERE (SELECT avg(x) * 4 FROM gfr) <= price")
    assert(e.streamingJob("gmv").nonEmpty)
    e.execute("FLUSH")
    def rows = e.table("gmv").select("k", "p").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows == Set(2L -> 20L, 3L -> 30L)) // avg=5 → threshold 20
    e.execute("UPDATE gfr SET x = 10 WHERE rk = 2") // avg=7 → 28
    e.execute("FLUSH")
    assert(rows == Set(3L -> 30L))
    e.streamingJob("gmv").foreach(_.stop())
  }
}
