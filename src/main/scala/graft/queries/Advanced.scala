package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.IterativeFixpoint
import graft.streaming.Changelog

/** Remaining SURVEY.md §2 surface: recursive CTE (driver fixpoint loop),
  * table changelog derivation, approximate sketch aggregates. Sketch
  * VALUES are engine-specific, so each sketch query hashes its exact
  * relational aggregate plus a bounded-error boolean the oracle asserts
  * `true` — a hash match proves every estimate was in bound (fine-grained
  * accuracy is additionally asserted in ApproxAggSpec).
  */
object Advanced extends QueryPack {

  /** Demo external-UDF server backing `q_external_udf` — started lazily,
    * shared for the JVM's lifetime (daemon threads): the query's
    * DataFrame is materialized AFTER the runner returns (Verify writes
    * parquet, Bench writes noop), so the server must outlive the call.
    */
  private lazy val udfDemo = graft.tools.UdfServe.start()

  val queries: Seq[GraftQuery] = Seq(
    // External UDF server end-to-end under the DuckDB gate: the engine
    // ships row batches to a live (in-process, loopback) UDF server and
    // zips typed results back — the reference's `CREATE FUNCTION …
    // USING LINK` data path (src/expr/impl/src/udf/external.rs); DuckDB
    // recomputes with its native gcd. Batched relational form
    // (ExternalUdf.applyBatched) — the Arrow-Flight-shaped exchange.
    q("q_external_udf",
      """SELECT p_partkey, CAST(gcd(p_partkey, 36) AS BIGINT) AS g
        |FROM part WHERE p_partkey < 2000 ORDER BY p_partkey""".stripMargin) { s =>
      val df = s.table("part").where(col("p_partkey") < 2000)
        .select(col("p_partkey"), lit(36L).as("b"))
      graft.functions.ExternalUdf.applyBatched(df, udfDemo.link, "gcd",
          Seq("p_partkey", "b"), "g", LongType, batchSize = 256)
        .select(col("p_partkey"), col("g"))
        .orderBy("p_partkey")
    },
    // Embedded python UDF end-to-end under the DuckDB gate: the user's
    // source body ships inside the plan and per-executor python3 worker
    // pools evaluate it in row batches — the reference's `CREATE
    // FUNCTION … LANGUAGE python AS $$…$$` data path (src/expr/impl/
    // src/udf/python.rs). DuckDB recomputes with its native gcd.
    q("q_udf_python",
      """SELECT p_partkey, CAST(gcd(p_partkey, 84) AS BIGINT) AS g
        |FROM part WHERE p_partkey < 2000 ORDER BY p_partkey""".stripMargin) { s =>
      val df = s.table("part").where(col("p_partkey") < 2000)
        .select(col("p_partkey"))
      graft.functions.EmbeddedUdf.applyBatched(df, "python", "pygcd84",
          "import math\ndef pygcd84(k):\n    return math.gcd(k, 84)\n",
          Seq("p_partkey"), "g", LongType, batchSize = 256)
        .orderBy("p_partkey")
    },
    // Embedded javascript UDF (quickjs.rs analog, node worker pools):
    // string transform DuckDB replicates with reverse(upper(…)).
    q("q_udf_js",
      """SELECT p_partkey, reverse(upper(p_name)) AS r
        |FROM part WHERE p_partkey < 2000 ORDER BY p_partkey""".stripMargin) { s =>
      val df = s.table("part").where(col("p_partkey") < 2000)
        .select(col("p_partkey"), col("p_name"))
      graft.functions.EmbeddedUdf.applyBatched(df, "javascript", "jsrevup",
          "function jsrevup(s) { return s.toUpperCase().split('').reverse().join(''); }",
          Seq("p_name"), "r", StringType, batchSize = 256)
        .select(col("p_partkey"), col("r"))
        .orderBy("p_partkey")
    },
    // Embedded python UDAF (CREATE AGGREGATE … LANGUAGE python): Spark
    // buffers+merges partials per group, python folds each final group
    // ONCE through create_state/accumulate — exact integer bit-or, so
    // hash-deterministic regardless of partition order. DuckDB
    // recomputes with its native bit_or.
    q("q_udf_agg_python",
      """SELECT l_orderkey, CAST(bit_or(l_partkey) AS BIGINT) AS m
        |FROM lineitem WHERE l_orderkey < 1000
        |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin) { s =>
      graft.functions.EmbeddedRegistration.aggregate(s, "py_bitor", "python",
        "def create_state():\n    return 0\ndef accumulate(s, x):\n    return s | x\n",
        Seq(LongType), LongType)
      s.sql(
        """SELECT l_orderkey, py_bitor(l_partkey) AS m
          |FROM lineitem WHERE l_orderkey < 1000
          |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin)
    },
    // Embedded python UDTF (RETURNS TABLE generator) in LATERAL VIEW:
    // per-row rows yielded by a python generator, aggregated Spark-side.
    // DuckDB recomputes with string_split + unnest.
    q("q_udf_table_python",
      """SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS n FROM (
        |  SELECT unnest(string_split(text, ' ')) AS w
        |  FROM documents WHERE doc_id < 60
        |) WHERE w <> '' GROUP BY w
        |ORDER BY n DESC, word LIMIT 15""".stripMargin) { s =>
      graft.functions.EmbeddedRegistration.table(s, "py_words", "python",
        "def py_words(s):\n    for w in s.split(' '):\n        if w:\n            yield (w,)\n",
        Seq(StringType),
        StructType(Seq(StructField("word", StringType))))
      s.sql(
        """SELECT t.word AS word, COUNT(*) AS n
          |FROM documents LATERAL VIEW py_words(text) t AS word
          |WHERE doc_id < 60 GROUP BY t.word
          |ORDER BY n DESC, word LIMIT 15""".stripMargin)
    },
    // Recursive CTE: transitive closure over a deterministic cyclic edge
    // set derived from nation. DuckDB runs the real WITH RECURSIVE; the
    // engine runs IterativeFixpoint.transitiveClosure.
    // reference: src/frontend/src/optimizer/plan_node/logical_recursive_union.rs
    q("q_recursive_cte",
      """WITH RECURSIVE
        |edges AS (
        |  SELECT n_nationkey AS src, (n_nationkey + 5) % 25 AS dst
        |  FROM nation WHERE n_nationkey < 25
        |),
        |paths(src, dst) AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT p.src, e.dst FROM paths p JOIN edges e ON p.dst = e.src
        |)
        |SELECT src, dst FROM paths ORDER BY src, dst""".stripMargin) { s =>
      val edges = s.table("nation").where(col("n_nationkey") < 25)
        .select(col("n_nationkey").as("src"),
          ((col("n_nationkey") + 5) % 25).as("dst"))
      IterativeFixpoint.transitiveClosure(edges).orderBy("src", "dst")
    },

    // Changelog derivation between two table snapshots (CREATE MV ... AS
    // CHANGELOG analog). Oracle replicates the diff semantics with a full
    // outer join. reference: src/stream/src/executor/changelog.rs:26
    q("q_changelog_diff",
      """WITH before AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |  WHERE o_orderkey < 3000
        |), after AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 1.0
        |         ELSE o_totalprice END AS o_totalprice
        |  FROM orders WHERE o_orderkey >= 1000 AND o_orderkey < 4000
        |)
        |SELECT o_orderkey, o_orderstatus, o_totalprice, _op FROM (
        |  SELECT b.o_orderkey, b.o_orderstatus, b.o_totalprice, 2 AS _op
        |  FROM before b LEFT JOIN after a ON a.o_orderkey = b.o_orderkey
        |  WHERE a.o_orderkey IS NULL
        |  UNION ALL
        |  SELECT a.o_orderkey, a.o_orderstatus, a.o_totalprice, 1 AS _op
        |  FROM after a LEFT JOIN before b ON b.o_orderkey = a.o_orderkey
        |  WHERE b.o_orderkey IS NULL
        |  UNION ALL
        |  SELECT a.o_orderkey, a.o_orderstatus, a.o_totalprice, 3 AS _op
        |  FROM before b JOIN after a ON a.o_orderkey = b.o_orderkey
        |  WHERE b.o_totalprice IS DISTINCT FROM a.o_totalprice
        |     OR b.o_orderstatus IS DISTINCT FROM a.o_orderstatus
        |) ORDER BY o_orderkey, _op""".stripMargin) { s =>
      val before = s.table("orders").where(col("o_orderkey") < 3000)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      val after = s.table("orders")
        .where(col("o_orderkey") >= 1000 && col("o_orderkey") < 4000)
        .select(col("o_orderkey"), col("o_orderstatus"),
          when(col("o_orderkey") % 10 === 0, col("o_totalprice") + 1.0)
            .otherwise(col("o_totalprice")).as("o_totalprice"))
      Changelog.diff(before, after, Seq("o_orderkey"))
        .drop(Changelog.SeqCol)
        .orderBy("o_orderkey", Changelog.OpCol)
    },

    // Approximate sketches: the sketch VALUE is engine-specific, so the
    // hash-matched surface is (group, exact aggregate, bounded-error
    // boolean): the engine computes `ok = |est − exact| / exact ≤ bound`
    // with the exact side derived relationally in the same query; the
    // oracle computes the same exact aggregate and asserts `true` — the
    // hash matches iff every group's estimate was in bound.
    // reference: src/expr/impl/src/aggregate/approx_count_distinct/mod.rs:34
    q("q_approx_count_distinct",
      """SELECT o_orderstatus,
        |  CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_cust,
        |  true AS ok
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { s =>
      // HLL++ rsd defaults to 0.05; 0.15 gives 3σ headroom at every SF
      s.table("orders").groupBy("o_orderstatus")
        .agg(approx_count_distinct(col("o_custkey")).as("est"),
          countDistinct(col("o_custkey")).as("exact_cust"))
        .select(col("o_orderstatus"), col("exact_cust"),
          (abs(col("est") - col("exact_cust")) /
            col("exact_cust") <= 0.15).as("ok"))
        .orderBy("o_orderstatus")
    },

    // Retraction-capable HLL over a changelog-shaped input: live distinct
    // customers after the F-status inserts are retracted. Exact side is
    // the net-count-positive distinct, computed relationally from the
    // SAME changelog on both engines; a fully-retracted group must
    // estimate exactly 0 (all registers decremented back).
    // reference: src/expr/impl/src/aggregate/approx_count_distinct/mod.rs
    q("q_retractable_hll",
      """SELECT o_orderstatus,
        |  CAST(COUNT(DISTINCT CASE WHEN o_orderstatus <> 'F'
        |                           THEN o_custkey END) AS BIGINT) AS live_exact,
        |  true AS ok
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { s =>
      // synthetic changelog in ONE scan: every order inserts, F-status
      // orders also retract (explode emits both ops per row) → live
      // distinct customers of non-F orders. The exact side rides the
      // SAME aggregation (live = distinct non-F custkeys), so the whole
      // check is one scan + one agg — no second pass, no join.
      val changelog = s.table("orders").select(
        col("o_orderstatus"), col("o_custkey"),
        explode(when(col("o_orderstatus") === "F", array(lit(1), lit(-1)))
          .otherwise(array(lit(1)))).as("op"))
      val est = changelog.groupBy("o_orderstatus")
        .agg(graft.functions.RetractableHll
          .approxCountDistinctRetractable(col("o_custkey"), col("op"))
          .as("est"))
      // exact side separate (a distinct-agg fused with the UDAF would
      // Expand-duplicate the UDAF's input); the join is 3 rows × 3 rows
      val exact = s.table("orders").groupBy("o_orderstatus")
        .agg(countDistinct(when(col("o_orderstatus") =!= "F", col("o_custkey")))
          .as("live_exact"))
      exact.join(est, "o_orderstatus")
        .select(col("o_orderstatus"), col("live_exact"),
          when(col("live_exact") === 0, col("est") === 0)
            .otherwise(abs(col("est") - col("live_exact")) /
              col("live_exact") <= 0.15).as("ok"))
        .orderBy("o_orderstatus")
    },

    // Retraction-capable approx percentile over a changelog-shaped input:
    // live p50 price of non-returned items after the 'R' inserts are
    // retracted. The log-bucket histogram guarantees 1% relative error
    // vs the rank element; the boolean checks 2% vs the exact
    // interpolated percentile (interpolation adds sub-bucket noise).
    // The hashed exact column is the live multiset size.
    // reference: src/stream/src/executor/approx_percentile/
    q("q_retractable_percentile",
      """SELECT l_linestatus,
        |  CAST(COUNT(*) AS BIGINT) AS live_n,
        |  true AS ok
        |FROM lineitem WHERE l_returnflag <> 'R'
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin) { s =>
      // synthetic changelog in ONE scan: every lineitem inserts, returned
      // ('R') rows also retract → live p50 price of non-returned items.
      // Exact side (count + interpolated percentile over the live rows)
      // rides the same aggregation — one scan, one agg, no join.
      val changelog = s.table("lineitem").select(
        col("l_linestatus"), col("l_extendedprice"),
        explode(when(col("l_returnflag") === "R", array(lit(1), lit(-1)))
          .otherwise(array(lit(1)))).as("op"))
      val est = changelog.groupBy("l_linestatus")
        .agg(graft.functions.RetractablePercentile
          .approxPercentileRetractable(col("l_extendedprice"), col("op"), 0.5)
          .as("est"))
      val exact = s.table("lineitem").where(col("l_returnflag") =!= "R")
        .groupBy("l_linestatus")
        .agg(count(lit(1)).as("live_n"),
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(20000))
            .as("p50x"))
      exact.join(est, "l_linestatus")
        .select(col("l_linestatus"), col("live_n"),
          (abs(col("est") - col("p50x")) / col("p50x") <= 0.02).as("ok"))
        .orderBy("l_linestatus")
    },

    // Batch two-phase approx percentile (reference:
    // src/stream/src/executor/approx_percentile/): three quantiles, each
    // checked against the exact interpolated percentile at 2% relative.
    // accuracy=10000 bounds rank error at n/10000 — far inside 2% in
    // value space on this distribution at every SF.
    q("q_approx_percentile",
      """SELECT l_returnflag,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  true AS ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { s =>
      // the "exact" reference side runs at accuracy 40000 — rank error
      // n/40000 (≈15 rows at sf0.1) is far inside the 2% value-space
      // bound, and it avoids percentile()'s buffer-everything sort.
      // ONE sketch per accuracy queried at all three quantiles (array
      // form) instead of six independent sketches: identical answers
      // (same accuracy ⇒ the same QuantileSummaries state; the three
      // separate sketches were byte-identical copies), 3× less sketch
      // insertion/merge work per row (guide §1.2 "per-task work").
      s.table("lineitem").groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          percentile_approx(col("l_extendedprice"),
            array(lit(0.25), lit(0.5), lit(0.75)), lit(10000)).as("e"),
          percentile_approx(col("l_extendedprice"),
            array(lit(0.25), lit(0.5), lit(0.75)), lit(40000)).as("x"))
        .select(col("l_returnflag"), col("n"),
          ((abs(col("e").getItem(1) - col("x").getItem(1)) / col("x").getItem(1) <= 0.02) &&
            (abs(col("e").getItem(0) - col("x").getItem(0)) / col("x").getItem(0) <= 0.02) &&
            (abs(col("e").getItem(2) - col("x").getItem(2)) / col("x").getItem(2) <= 0.02)).as("ok"))
        .orderBy("l_returnflag")
    },

    // Batch time travel under the DuckDB gate (reference:
    // FOR SYSTEM_TIME AS OF, binder/relation/mod.rs:353-425): a CTAS
    // table takes INSERT (epoch 0), UPDATE (epoch 1), DELETE (epoch 2);
    // the engine reads the image AS OF epoch 1 — INSERT and UPDATE
    // applied, DELETE not yet — and DuckDB recomputes that prefix
    // declaratively.
    qDir("q_time_travel",
      """WITH base AS (
        |  SELECT CAST(n_nationkey AS BIGINT) AS k,
        |         CAST(n_regionkey AS BIGINT) AS r FROM nation
        |  UNION ALL SELECT 200, 0 UNION ALL SELECT 201, 4
        |)
        |SELECT k, CASE WHEN k % 3 = 2 THEN r + 10 ELSE r END AS r
        |FROM base ORDER BY k""".stripMargin) { (s, dir) =>
      val wh = java.nio.file.Files.createTempDirectory("q_time_travel").toString
      val e = new graft.Engine(s, wh)
      e.attachTables(dir)
      val shufBefore = s.conf.get("spark.sql.shuffle.partitions")
      e.execute("SET streaming_parallelism = 4")
      try {
        e.execute(
          """CREATE TABLE tt_nat (PRIMARY KEY (k)) AS
            |SELECT CAST(n_nationkey AS BIGINT) AS k,
            |       CAST(n_regionkey AS BIGINT) AS r FROM nation""".stripMargin)
        e.execute("INSERT INTO tt_nat VALUES (200, 0), (201, 4)")   // epoch 0
        e.execute("UPDATE tt_nat SET r = r + 10 WHERE k % 3 = 2")   // epoch 1
        e.execute("DELETE FROM tt_nat WHERE k % 5 = 1")             // epoch 2
        e.execute("FLUSH")
        e.execute("SELECT * FROM tt_nat FOR SYSTEM_TIME AS OF 1")
          .select(col("k"), col("r"))
          .orderBy("k")
      } finally s.conf.set("spark.sql.shuffle.partitions", shufBefore)
    },

    // SQL DML lifecycle + incrementally-chained MV, DuckDB-checked: a
    // table seeded from nation (CTAS) takes an INSERT, a group-moving
    // UPDATE (U-/U+ image pair) and a DELETE through the engine's DML
    // path while a chained aggregate MV maintains continuously; the
    // final MV content must equal DuckDB evaluating the same statement
    // sequence declaratively. reference: handler/create_table.rs +
    // src/stream/src/executor/dml.rs (table DML feeds downstream MVs).
    qDir("q_dml_chain",
      """WITH base AS (
        |  SELECT CAST(n_nationkey AS BIGINT) AS k,
        |         CAST(n_regionkey AS BIGINT) AS r FROM nation
        |  UNION ALL SELECT 100, 1 UNION ALL SELECT 101, 2
        |), upd AS (
        |  SELECT k, CASE WHEN k % 4 = 1 THEN (r + 1) % 5 ELSE r END AS r
        |  FROM base
        |), fin AS (
        |  SELECT k, r FROM upd WHERE k % 5 <> 3
        |)
        |SELECT r AS n_regionkey, CAST(count(*) AS BIGINT) AS n
        |FROM fin GROUP BY r ORDER BY n_regionkey""".stripMargin) { (s, dir) =>
      val wh = java.nio.file.Files.createTempDirectory("q_dml_chain").toString
      val e = new graft.Engine(s, wh)
      e.attachTables(dir)
      // the scenario is a 27-row table: 32-way stores/shuffles would be
      // pure fixed overhead ×4 DML epochs ×2 stores. The session knob is
      // exactly what a reference user sets for a small streaming job
      // (streaming_parallelism); results are layout-independent.
      val shufBefore = s.conf.get("spark.sql.shuffle.partitions")
      e.execute("SET streaming_parallelism = 4")
      try {
      e.execute(
        """CREATE TABLE dml_nat (PRIMARY KEY (n_nationkey)) AS
          |SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
          |       CAST(n_regionkey AS BIGINT) AS n_regionkey FROM nation""".stripMargin)
      e.execute(
        """CREATE MATERIALIZED VIEW dml_nat_cnt (PRIMARY KEY (n_regionkey)) AS
          |SELECT n_regionkey, count(*) AS n FROM dml_nat GROUP BY n_regionkey""".stripMargin)
      e.execute("INSERT INTO dml_nat VALUES (100, 1), (101, 2)")
      e.execute("UPDATE dml_nat SET n_regionkey = (n_regionkey + 1) % 5 " +
        "WHERE n_nationkey % 4 = 1")
      e.execute("DELETE FROM dml_nat WHERE n_nationkey % 5 = 3")
      e.execute("FLUSH")
      e.streamingJob("dml_nat_cnt").foreach(_.stop())
      e.table("dml_nat_cnt")
        .select(col("n_regionkey"), col("n").cast(LongType).as("n"))
        .orderBy("n_regionkey")
      } finally s.conf.set("spark.sql.shuffle.partitions", shufBefore)
    },

    // Generated columns + ON CONFLICT under the DuckDB gate (reference:
    // handler/create_table.rs): a table with `d BIGINT AS a * 2 + r`
    // and ON CONFLICT IGNORE takes a seed insert, a duplicate-PK insert
    // (kept rows must be the FIRST image), and an UPDATE that must
    // recompute d; the final content must equal DuckDB evaluating the
    // same statement sequence declaratively.
    qDir("q_dml_features",
      """WITH seed AS (
        |  SELECT CAST(n_nationkey AS BIGINT) AS k,
        |         CAST(n_regionkey AS BIGINT) AS a FROM nation
        |), dup AS ( -- duplicate-PK re-insert: IGNORE keeps the seed image
        |  SELECT k, a FROM seed
        |), upd AS (
        |  SELECT k, CASE WHEN k % 3 = 0 THEN a + 10 ELSE a END AS a FROM seed
        |)
        |SELECT k, a, a * 2 + k AS d FROM upd ORDER BY k""".stripMargin) { (s, dir) =>
      val wh = java.nio.file.Files.createTempDirectory("q_dml_features").toString
      val e = new graft.Engine(s, wh)
      e.attachTables(dir)
      val shufBefore = s.conf.get("spark.sql.shuffle.partitions")
      e.execute("SET streaming_parallelism = 4")
      try {
        e.execute("CREATE TABLE feat_t (k BIGINT PRIMARY KEY, a BIGINT, " +
          "d BIGINT AS a * 2 + k) ON CONFLICT IGNORE")
        e.execute("INSERT INTO feat_t SELECT CAST(n_nationkey AS BIGINT), " +
          "CAST(n_regionkey AS BIGINT) FROM nation")
        // duplicate-PK burst with DIFFERENT values: IGNORE keeps the seed
        e.execute("INSERT INTO feat_t SELECT CAST(n_nationkey AS BIGINT), " +
          "CAST(n_regionkey AS BIGINT) + 99 FROM nation")
        // generated column recomputes from the post-assignment row
        e.execute("UPDATE feat_t SET a = a + 10 WHERE k % 3 = 0")
        e.table("feat_t")
          .select(col("k"), col("a"), col("d"))
          .orderBy("k")
      } finally s.conf.set("spark.sql.shuffle.partitions", shufBefore)
    },

    // CREATE AGGREGATE aggregates called from plain SQL text (reference:
    // handler/create_aggregate.rs) — estimates checked against exact
    // aggregates computed in the same query, sketch-oracle style. The
    // registry is exercised directly: the full SQL-DDL + durable-catalog
    // lifecycle is proven in SqlFrontendSpec/DurableCatalogSpec — timing
    // an Engine bootstrap here would bench the wrong thing.
    qDir("q_create_aggregate",
      """SELECT o_orderstatus,
        |  CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_cust,
        |  true AS acd_ok, true AS p50_ok
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, _) =>
      graft.functions.AggregateRegistry.register(
        s, "q_ca_acd", "retractable_hll", Map.empty)
      graft.functions.AggregateRegistry.register(
        s, "q_ca_p50", "retractable_percentile",
        Map("quantile" -> "0.5", "relative_error" -> "0.01"))
      s.sql(
        """WITH est AS (
          |  SELECT o_orderstatus,
          |    q_ca_acd(CAST(o_custkey AS STRING), 1) AS est_cd,
          |    q_ca_p50(o_totalprice, 1) AS est_p50
          |  FROM orders GROUP BY o_orderstatus),
          |exd AS ( -- exact sides in their own passes: a distinct agg
          |         -- fused with a sketch makes the Expand's first-stage
          |         -- per-custkey grouping allocate one sketch per
          |         -- customer (measured 68s); separated, each agg is a
          |         -- clean two-phase pass joined on 3 group rows
          |  SELECT o_orderstatus,
          |    CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_cust
          |  FROM orders GROUP BY o_orderstatus),
          |exp AS (
          |  SELECT o_orderstatus, approx_percentile(o_totalprice, 0.5, 40000) AS p50x
          |  FROM orders GROUP BY o_orderstatus)
          |SELECT exd.o_orderstatus, exact_cust,
          |  abs(est_cd - exact_cust) / exact_cust <= 0.15 AS acd_ok,
          |  abs(est_p50 - p50x) / p50x <= 0.02 AS p50_ok
          |FROM exd
          |JOIN exp ON exp.o_orderstatus = exd.o_orderstatus
          |JOIN est ON est.o_orderstatus = exd.o_orderstatus
          |ORDER BY o_orderstatus""".stripMargin)
    }
  )
}
