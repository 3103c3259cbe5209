package graft

import org.apache.spark.sql.functions._

import graft.streaming.{Changelog, DynamicFilter, DynamicSetFilter, MvCatalog}

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

  // ---- dynamic-set operator edges (advice r8): combined-batch key
  // moves, NOT IN ∅ with NULL left keys, replay atomicity of the
  // key-set state, and the bucket-pruned set-move repair.

  private def mkSetFilter(tag: String, negated: Boolean,
      buckets: Int = 4): (DynamicSetFilter,
      graft.streaming.MaterializedView, graft.streaming.MaterializedView) = {
    val cat = new MvCatalog(spark, tmpDir(tag))
    val lhs = cat.define(s"${tag}_lhs", Seq("id"), nBuckets = buckets,
      bucketKeys = Seq("k"))
    val keys = cat.define(s"${tag}_keys", Seq("k"), nBuckets = buckets)
    val res = cat.define(s"${tag}_res", Seq("id"), nBuckets = buckets)
    (new DynamicSetFilter(lhs, keys, res, "k", negated), res, keys)
  }

  private def setIds(mv: graft.streaming.MaterializedView): Set[Long] =
    if (mv.read().columns.isEmpty) Set.empty
    else mv.read().select("id").as[Long].collect().toSet

  private val emptyDelta = Seq.empty[(Long, Long)].toDF("id", "k")

  test("dynamic-set: one batch carrying a left key move AND a set move " +
      "keeps a row that lands on a surviving key") {
    val (f, res, _) = mkSetFilter("dsmov", negated = false)
    f.applyDelta(Seq((10L, 1L), (11L, 2L)).toDF("id", "k"),
      Some(Seq(1L, 2L).toDF("k")), batchId = 0L)
    assert(setIds(res) == Set(10L, 11L))
    // one micro-batch: row 10 moves key 1 → 2 (UD+UI) while key 1
    // LEAVES the set — the post-merge key (2, still in set) is the
    // membership truth; a pre-epoch-result-derived delete would win the
    // seq tie and silently drop the row
    val moved = Seq(
      (10L, 1L, Changelog.UpdateDelete, 0L),
      (10L, 2L, Changelog.UpdateInsert, 1L)).toDF(
      "id", "k", Changelog.OpCol, Changelog.SeqCol)
    f.applyDelta(moved, Some(Seq(2L).toDF("k")), batchId = 1L)
    assert(setIds(res) == Set(10L, 11L),
      "row moved onto a surviving key must stay in the result")
  }

  test("dynamic-set NOT IN: combined batch with the mirrored entering-key move") {
    val (f, res, _) = mkSetFilter("dsmovn", negated = true)
    // empty set: both rows qualify (x NOT IN ∅)
    f.applyDelta(Seq((10L, 1L), (11L, 2L)).toDF("id", "k"),
      Some(Seq.empty[Long].toDF("k")), batchId = 0L)
    assert(setIds(res) == Set(10L, 11L))
    // row 10 moves key 1 → 3 while key 1 ENTERS the set: its new key is
    // outside the set, so it must stay
    val moved = Seq(
      (10L, 1L, Changelog.UpdateDelete, 0L),
      (10L, 3L, Changelog.UpdateInsert, 1L)).toDF(
      "id", "k", Changelog.OpCol, Changelog.SeqCol)
    f.applyDelta(moved, Some(Seq(1L).toDF("k")), batchId = 1L)
    assert(setIds(res) == Set(10L, 11L),
      "NOT IN row moved off an entering key must stay in the result")
  }

  test("dynamic-set NOT IN: empty set qualifies NULL left keys (x NOT IN ∅ is TRUE)") {
    val (f, res, _) = mkSetFilter("dsnull", negated = true)
    val rows = Seq((1L, Some(5L)), (2L, None), (3L, Some(7L)))
      .toDF("id", "k")
    // set ∅: ALL rows qualify, including the NULL key (SQL's vacuous
    // universal — DuckDB/Postgres return the row)
    f.applyDelta(rows, Some(Seq.empty[Long].toDF("k")), batchId = 0L)
    assert(setIds(res) == Set(1L, 2L, 3L))
    // set becomes {5}: key-5 row leaves AND the NULL row leaves (the
    // set is non-empty, NULL NOT IN {5} is unknown)
    f.applyDelta(emptyDelta, Some(Seq(5L).toDF("k")), batchId = 1L)
    assert(setIds(res) == Set(3L))
    // set empties again: everything returns, NULL included
    f.applyDelta(emptyDelta, Some(Seq.empty[Long].toDF("k")), batchId = 2L)
    assert(setIds(res) == Set(1L, 2L, 3L))
    // the set gains ONLY a NULL: poisoned — nothing qualifies
    f.applyDelta(emptyDelta, Some(Seq(Option.empty[Long]).toDF("k")),
      batchId = 3L)
    assert(setIds(res) == Set.empty[Long])
    // NULL leaves, set empty again: all three return
    f.applyDelta(emptyDelta, Some(Seq.empty[Long].toDF("k")), batchId = 4L)
    assert(setIds(res) == Set(1L, 2L, 3L))
  }

  test("dynamic-set: a committed-epoch replay re-applies result AND key-set " +
      "state — a moved RHS between crash and replay cannot tear them apart") {
    val (f, res, keys) = mkSetFilter("dsrep", negated = false)
    f.applyDelta(Seq((1L, 5L), (2L, 7L)).toDF("id", "k"),
      Some(Seq(5L).toDF("k")), batchId = 0L)
    assert(setIds(res) == Set(1L))
    // epoch 1 commits set {7}
    f.applyDelta(emptyDelta, Some(Seq(7L).toDF("k")), batchId = 1L)
    assert(setIds(res) == Set(2L))
    def keySet = keys.read().select("k").as[Long].collect().toSet
    assert(keySet == Set(7L))
    // crash/replay of epoch 1 with a MOVED rhs ({5} again): the
    // committed epoch must win — result and key-set state stay at the
    // commit-time set {7}, healed from the epoch-dir sidecar
    f.applyDelta(emptyDelta, Some(Seq(5L).toDF("k")), batchId = 1L)
    assert(setIds(res) == Set(2L))
    assert(keySet == Set(7L),
      "replay must restore the COMMIT-TIME key set, not the moved one")
    // the move lands once, at the NEXT epoch
    f.applyDelta(emptyDelta, Some(Seq(5L).toDF("k")), batchId = 2L)
    assert(setIds(res) == Set(1L))
    assert(keySet == Set(5L))
  }

  test("dynamic-set: a set-move repair reads only the flipped keys' buckets") {
    val (f, res, _) = mkSetFilter("dsprune", negated = false, buckets = 16)
    // 4000 base rows over 16 keys; the set starts EMPTY (result empty,
    // so the epoch-1 numbers below are dominated by the base read)
    val rows = (0 until 4000).map(i => (i.toLong, (i % 16).toLong))
    f.applyDelta(rows.toDF("id", "k"),
      Some(Seq.empty[Long].toDF("k")), batchId = 0L)
    assert(setIds(res).isEmpty)
    // one key enters: the repair must read the entering key's bucket
    // (≤ a few keys' worth under hash collisions), never the whole
    // 4000-row base store
    val read = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          read.addAndGet(te.taskMetrics.inputMetrics.recordsRead)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      f.applyDelta(emptyDelta, Some(Seq(0L).toDF("k")), batchId = 1L)
      Thread.sleep(1500) // listener bus is async
      // pruned: one bucket of the base (250 rows + collisions) + the
      // 250-row epoch delta read back from the journal + small key-set
      // reads; an un-pruned repair reads ≥4000 from the base alone
      assert(read.get < 2500,
        s"set-move repair read ${read.get} records — not bucket-pruned")
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(setIds(res).size == 250)
  }

  test("dynamic-set model fuzz: random key moves + set moves (incl. NULL and " +
      "empty sets) stay exact in both modes across epochs") {
    for (negated <- Seq(false, true); seed <- Seq(11, 42, 77)) {
      val r = new scala.util.Random(seed * (if (negated) 31 else 7))
      val (f, res, _) = mkSetFilter(s"dsfz${if (negated) "n" else "p"}$seed",
        negated)
      val rows = scala.collection.mutable.Map[Long, Option[Long]]()
      var curSet: Set[Long] = Set.empty
      var curNull = false
      var nextId = 0L
      def randKey(): Option[Long] =
        if (r.nextInt(10) == 0) None else Some(r.nextInt(8).toLong)
      // epoch 0 always evaluates the set (the engine's backfill does too)
      for (epoch <- 0 until 14) {
        val ops = scala.collection.mutable.ArrayBuffer[(Long, Option[Long], Int, Long)]()
        var seq = 0L
        for (_ <- 0 until r.nextInt(4)) r.nextInt(3) match {
          case 0 =>
            nextId += 1; val k = randKey(); rows(nextId) = k
            ops += ((nextId, k, Changelog.Insert, { seq += 1; seq }))
          case 1 if rows.nonEmpty =>
            val id = rows.keys.toSeq(r.nextInt(rows.size))
            val nu = randKey()
            ops += ((id, rows(id), Changelog.UpdateDelete, { seq += 1; seq }))
            ops += ((id, nu, Changelog.UpdateInsert, { seq += 1; seq }))
            rows(id) = nu
          case 2 if rows.nonEmpty =>
            val id = rows.keys.toSeq(r.nextInt(rows.size))
            ops += ((id, rows.remove(id).get, Changelog.Delete, { seq += 1; seq }))
          case _ =>
        }
        val setMove = epoch == 0 || r.nextInt(2) == 0
        val newKeys =
          if (!setMove) None
          else {
            curSet = (0 until r.nextInt(5)).map(_ => r.nextInt(8).toLong).toSet
            curNull = r.nextInt(5) == 0
            val ks = curSet.toSeq.map(Option(_)) ++
              (if (curNull) Seq(Option.empty[Long]) else Nil)
            Some(ks.toDF("k"))
          }
        val delta = ops.toSeq.toDF("id", "k", Changelog.OpCol, Changelog.SeqCol)
        f.applyDelta(delta, newKeys, batchId = epoch.toLong)
        def qualifies(k: Option[Long]): Boolean =
          if (!negated) k.exists(curSet.contains)
          else if (curNull) false
          else k.map(!curSet.contains(_)).getOrElse(curSet.isEmpty)
        val want = rows.collect { case (id, k) if qualifies(k) => id }.toSet
        assert(setIds(res) == want,
          s"negated=$negated seed=$seed epoch=$epoch set=$curSet null=$curNull " +
            s"rows=${rows.toMap}")
      }
    }
  }

  test("SQL chain: correlated subqueries keep the loud batch-refresh fence") {
    val dir = tmpDir("dyncorr")
    val e = new Engine(spark, dir)
    e.execute("CREATE TABLE cfl (k BIGINT PRIMARY KEY, v BIGINT)")
    e.execute("CREATE TABLE cfr (rk BIGINT PRIMARY KEY, k2 BIGINT, x BIGINT)")
    e.execute("INSERT INTO cfl VALUES (1, 10), (2, 20), (3, 30)")
    e.execute("INSERT INTO cfr VALUES (1, 1, 15), (2, 2, 15), (3, 3, 40)")
    e.execute("FLUSH")
    // correlated scalar subquery: the RHS references the outer row — the
    // dynamic-filter chain cannot evaluate it standalone, so the planner
    // must fence (advice r8: round 8 misclassified this shape and threw)
    e.execute("CREATE MATERIALIZED VIEW cmv (PRIMARY KEY (k)) AS " +
      "SELECT k, v FROM cfl WHERE v > " +
      "(SELECT max(x) FROM cfr WHERE cfr.k2 = cfl.k)")
    assert(e.streamingJob("cmv").isEmpty,
      "correlated scalar subquery must take the batch-refresh fence")
    assert(e.table("cmv").select("k").as[Long].collect().toSet == Set(2L))
    // correlated IN-subquery: same rule for the dynamic-set shape
    e.execute("CREATE MATERIALIZED VIEW cmv2 (PRIMARY KEY (k)) AS " +
      "SELECT k, v FROM cfl WHERE k IN " +
      "(SELECT k2 FROM cfr WHERE cfr.x > cfl.v)")
    assert(e.streamingJob("cmv2").isEmpty,
      "correlated IN subquery must take the batch-refresh fence")
    e.execute("INSERT INTO cfl VALUES (4, 5)")
    e.execute("INSERT INTO cfr VALUES (4, 4, 1)")
    e.execute("FLUSH")
    e.execute("REFRESH MATERIALIZED VIEW cmv")
    assert(e.table("cmv").select("k").as[Long].collect().toSet == Set(2L, 4L))
  }

  test("SQL chain: NOT IN over an empty subquery returns NULL-key rows " +
      "(batch-compared)") {
    val dir = tmpDir("dynsqlnull")
    val e = new Engine(spark, dir)
    e.execute("CREATE TABLE nfl (id BIGINT PRIMARY KEY, k BIGINT)")
    e.execute("CREATE TABLE nfr (rk BIGINT PRIMARY KEY, k BIGINT)")
    e.execute("INSERT INTO nfl VALUES (1, 5), (2, NULL), (3, 7)")
    e.execute("FLUSH")
    val sql = "SELECT id, k FROM nfl WHERE k NOT IN (SELECT k FROM nfr)"
    e.execute(s"CREATE MATERIALIZED VIEW nmv (PRIMARY KEY (id)) AS $sql")
    assert(e.streamingJob("nmv").nonEmpty)
    e.execute("FLUSH")
    def got = e.table("nmv").select("id").as[Long].collect().toSet
    def want = e.execute(sql).select("id").as[Long].collect().toSet
    assert(want == Set(1L, 2L, 3L), "batch oracle: x NOT IN ∅ is TRUE")
    assert(got == want)
    // set becomes non-empty: NULL-key row 2 and the matching key leave
    e.execute("INSERT INTO nfr VALUES (1, 5)")
    e.execute("FLUSH")
    assert(got == want && got == Set(3L))
    // set empties again: all return, NULL-key row included
    e.execute("DELETE FROM nfr WHERE rk = 1")
    e.execute("FLUSH")
    assert(got == want && got == Set(1L, 2L, 3L))
    e.streamingJob("nmv").foreach(_.stop())
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

  // ---- mixed-width membership keys (advice r9): the base store is
  // bucketed by hash(INT k) while the subquery evaluates to BIGINT —
  // Spark's hash() is type-sensitive, so the set-move repair must cast
  // the key frames to the base type before readTouched or it reads the
  // wrong buckets and silently misses stored rows.

  test("dynamic-set mixed-width: BIGINT subquery keys against an INT left " +
      "column flip the right rows (bucket hash must cast first)") {
    val cat = new MvCatalog(spark, tmpDir("dsmix"))
    val lhs = cat.define("dsmix_lhs", Seq("id"), nBuckets = 16,
      bucketKeys = Seq("k"))
    val keys = cat.define("dsmix_keys", Seq("k"), nBuckets = 16)
    val res = cat.define("dsmix_res", Seq("id"), nBuckets = 16)
    val f = new DynamicSetFilter(lhs, keys, res, "k", negated = false)
    val noDelta = Seq.empty[(Long, Int)].toDF("id", "k")
    // 64 base rows over 32 INT membership keys
    f.applyDelta((0 until 64).map(i => (i.toLong, i % 32)).toDF("id", "k"),
      Some(Seq.empty[Long].toDF("k")), batchId = 0L)
    assert(setIds(res).isEmpty)
    // 8 BIGINT keys enter: every key's stored rows must flip in
    f.applyDelta(noDelta, Some((0L until 8L).toDF("k")), batchId = 1L)
    assert(setIds(res) ==
      (0 until 64).filter(_ % 32 < 8).map(_.toLong).toSet,
      "entering BIGINT keys must reach the INT-hashed buckets")
    // 6 of them leave again (the mirrored direction)
    f.applyDelta(noDelta, Some(Seq(0L, 1L).toDF("k")), batchId = 2L)
    assert(setIds(res) ==
      (0 until 64).filter(_ % 32 < 2).map(_.toLong).toSet)
    // an out-of-int-range BIGINT key can match no stored row: dropped
    // from the repair frames without error, result unchanged
    f.applyDelta(noDelta, Some(Seq(0L, 1L, 5000000000L).toDF("k")),
      batchId = 3L)
    assert(setIds(res) ==
      (0 until 64).filter(_ % 32 < 2).map(_.toLong).toSet)
  }

  test("dynamic-set mixed-width NOT IN: an out-of-range BIGINT key keeps the " +
      "set NON-empty for NULL rows yet matches nothing") {
    val cat = new MvCatalog(spark, tmpDir("dsmixn"))
    val lhs = cat.define("dsmixn_lhs", Seq("id"), nBuckets = 4,
      bucketKeys = Seq("k"))
    val keys = cat.define("dsmixn_keys", Seq("k"), nBuckets = 4)
    val res = cat.define("dsmixn_res", Seq("id"), nBuckets = 4)
    val f = new DynamicSetFilter(lhs, keys, res, "k", negated = true)
    val noDelta = Seq.empty[(Long, Option[Int])].toDF("id", "k")
    f.applyDelta(Seq((1L, Some(5)), (2L, Option.empty[Int]), (3L, Some(7)))
      .toDF("id", "k"), Some(Seq.empty[Long].toDF("k")), batchId = 0L)
    assert(setIds(res) == Set(1L, 2L, 3L)) // NOT IN ∅ is TRUE, NULL incl.
    // set {5e9}: no INT row matches (5 ≠ 5e9 under BIGINT coercion) but
    // the set IS non-empty — the NULL-key row leaves, the others stay
    f.applyDelta(noDelta, Some(Seq(5000000000L).toDF("k")), batchId = 1L)
    assert(setIds(res) == Set(1L, 3L),
      "out-of-range key: non-empty set semantics for NULL rows")
    // set {5}: key-5 row leaves, NULL stays out
    f.applyDelta(noDelta, Some(Seq(5L).toDF("k")), batchId = 2L)
    assert(setIds(res) == Set(3L))
    // set empties: all return
    f.applyDelta(noDelta, Some(Seq.empty[Long].toDF("k")), batchId = 3L)
    assert(setIds(res) == Set(1L, 2L, 3L))
  }

  test("SQL chain: type-coerced IN (INT column, BIGINT subquery) chains and " +
      "stays exact across set moves") {
    val dir = tmpDir("dynmixsql")
    val e = new Engine(spark, dir)
    e.execute("CREATE TABLE mfa (id INT PRIMARY KEY, item STRING)")
    e.execute("CREATE TABLE mfb (bk BIGINT PRIMARY KEY, auction BIGINT)")
    e.execute("INSERT INTO mfa VALUES (1,'a'),(2,'b'),(3,'c')")
    e.execute("INSERT INTO mfb VALUES (10,1),(11,1),(12,3)")
    e.execute("FLUSH")
    e.execute("CREATE MATERIALIZED VIEW mmv (PRIMARY KEY (id)) AS " +
      "SELECT id, item FROM mfa WHERE id IN " +
      "(SELECT auction FROM mfb GROUP BY auction HAVING count(*) >= 2)")
    assert(e.streamingJob("mmv").nonEmpty,
      "a coercion Cast on the probe side must not block the chain")
    e.execute("FLUSH")
    def got = e.table("mmv").select("id").as[Int].collect().toSet
    assert(got == Set(1))
    // key 3 enters the BIGINT set: the INT-bucketed base rows must flip
    // in (pre-fix, hash(BIGINT 3) picked a wrong bucket and missed them)
    e.execute("INSERT INTO mfb VALUES (13, 3)")
    e.execute("FLUSH")
    assert(got == Set(1, 3))
    // key 1 leaves
    e.execute("DELETE FROM mfb WHERE bk = 10")
    e.execute("FLUSH")
    assert(got == Set(3))
    e.streamingJob("mmv").foreach(_.stop())
  }
}
