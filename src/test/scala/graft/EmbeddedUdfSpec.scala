package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{EmbeddedUdf, EmbeddedUdfRuntime}

/** Embedded python/javascript UDF runtimes (reference:
  * src/expr/impl/src/udf/python.rs, quickjs.rs + handler/
  * create_function.rs): `CREATE FUNCTION … LANGUAGE python AS $$…$$`
  * evaluates the user's source in interpreter subprocess pools.
  * Every test gates on the interpreter binary actually being spawnable,
  * so a python-less deploy skips instead of failing.
  */
class EmbeddedUdfSpec extends SparkSpecBase {
  import spark.implicits._

  test("python UDF: SQL-callable, typed, NULLs, errors, durable, droppable") {
    assume(EmbeddedUdfRuntime.available("python"), "python3 not on PATH")
    val wh = tmpDir("pyudf")
    val e = new Engine(spark, wh)
    e.execute("CREATE TABLE pynums (id BIGINT PRIMARY KEY, a BIGINT, b BIGINT)")
    e.execute("INSERT INTO pynums VALUES (1, 12, 18), (2, 270, 192), (3, 7, 0)")
    e.execute("FLUSH")
    e.execute(
      """CREATE FUNCTION py_gcd(a BIGINT, b BIGINT) RETURNS BIGINT
        |LANGUAGE python AS $$
        |import math
        |def py_gcd(a, b):
        |    if a is None or b is None:
        |        return None
        |    return math.gcd(a, b)
        |$$""".stripMargin)

    // expression position: projection + WHERE (implicit casts included)
    val got = e.execute(
      """SELECT id, py_gcd(a, b) AS g FROM pynums
        |WHERE py_gcd(a, b) > 2 ORDER BY id""".stripMargin)
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 6L), (2L, 6L), (3L, 7L)))
    assert(e.execute("SELECT py_gcd(NULL, 3) AS g").head().isNullAt(0))

    // a python exception fails the query with the interpreter's message
    e.execute(
      """CREATE FUNCTION py_boom(x BIGINT) RETURNS BIGINT
        |LANGUAGE python AS $$
        |def py_boom(x):
        |    raise ValueError('kaboom ' + str(x))
        |$$""".stripMargin)
    val err = intercept[Exception] { e.execute("SELECT py_boom(7)").collect() }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(err).exists(_.contains("kaboom 7")))

    // pg_proc surfaces it for psql \df
    assert(e.execute(
      "SELECT proname FROM pg_catalog.pg_proc WHERE proname = 'py_gcd'")
      .count() == 1)

    // durable: a fresh engine re-binds the body from the catalog
    val e2 = new Engine(spark.newSession(), wh)
    assert(e2.execute("SELECT py_gcd(21, 6) AS g").head().getLong(0) == 3L)
    e2.execute("DROP FUNCTION py_gcd")
    intercept[Exception] { e2.execute("SELECT py_gcd(21, 6)").collect() }
    val e3 = new Engine(spark.newSession(), wh)
    intercept[Exception] { e3.execute("SELECT py_gcd(21, 6)").collect() }
  }

  test("python UDF: strings, doubles (NaN/Inf), decimals, arrays") {
    assume(EmbeddedUdfRuntime.available("python"), "python3 not on PATH")
    val e = new Engine(spark, tmpDir("pyudf2"))
    e.execute(
      """CREATE FUNCTION py_revup(s VARCHAR) RETURNS VARCHAR
        |LANGUAGE python AS $$
        |def py_revup(s):
        |    return s[::-1].upper() if s is not None else None
        |$$""".stripMargin)
    assert(e.execute("SELECT py_revup('graft') AS r").as[String].head()
      == "TFARG")

    e.execute(
      """CREATE FUNCTION py_curve(x DOUBLE) RETURNS DOUBLE
        |LANGUAGE python AS $$
        |import math
        |def py_curve(x):
        |    return math.inf if x > 0 else (math.nan if x < 0 else x)
        |$$""".stripMargin)
    val rows = e.execute(
      "SELECT py_curve(1.0) AS p, py_curve(-1.0) AS n, py_curve(0.0) AS z")
      .head()
    assert(rows.getDouble(0).isPosInfinity)
    assert(rows.getDouble(1).isNaN)
    assert(rows.getDouble(2) == 0.0)

    e.execute(
      """CREATE FUNCTION py_ticket(p DECIMAL(12,2)) RETURNS DECIMAL(12,2)
        |LANGUAGE python AS $$
        |def py_ticket(p):
        |    return p * 2
        |$$""".stripMargin)
    assert(e.execute("SELECT py_ticket(CAST(10.25 AS DECIMAL(12,2))) AS t")
      .head().getDecimal(0).toString == "20.50")

    // arrays in AND out (an embedding column reaching python)
    e.execute(
      """CREATE FUNCTION py_norm(v DOUBLE[]) RETURNS DOUBLE
        |LANGUAGE python AS $$
        |import math
        |def py_norm(v):
        |    return math.sqrt(sum(x * x for x in v))
        |$$""".stripMargin)
    assert(e.execute("SELECT py_norm(array(3.0d, 4.0d)) AS n")
      .head().getDouble(0) == 5.0)
    e.execute(
      """CREATE FUNCTION py_scale(v DOUBLE[], k DOUBLE) RETURNS DOUBLE[]
        |LANGUAGE python AS $$
        |def py_scale(v, k):
        |    return [x * k for x in v]
        |$$""".stripMargin)
    assert(e.execute("SELECT py_scale(array(1.0d, 2.5d), 2.0) AS v")
      .head().getSeq[Double](0) == Seq(2.0, 5.0))
  }

  test("javascript UDF: SQL-callable, BigInt results, durable") {
    assume(EmbeddedUdfRuntime.available("javascript"), "node not on PATH")
    val wh = tmpDir("jsudf")
    val e = new Engine(spark, wh)
    e.execute(
      """CREATE FUNCTION js_clamp(x DOUBLE) RETURNS DOUBLE
        |LANGUAGE javascript AS $$
        |function js_clamp(x) {
        |  if (x === null) return null;
        |  return Math.min(Math.max(x, 10), 40);
        |}
        |$$""".stripMargin)
    assert(e.execute("SELECT js_clamp(3.0) AS c").head().getDouble(0) == 10.0)
    assert(e.execute("SELECT js_clamp(25.0) AS c").head().getDouble(0) == 25.0)
    assert(e.execute("SELECT js_clamp(NULL) AS c").head().isNullAt(0))

    // BigInt arithmetic round-trips exactly (decimal-string encoding)
    e.execute(
      """CREATE FUNCTION js_pow2(n BIGINT) RETURNS BIGINT
        |LANGUAGE javascript AS $$
        |function js_pow2(n) { return 2n ** BigInt(n); }
        |$$""".stripMargin)
    assert(e.execute("SELECT js_pow2(62) AS p").head().getLong(0)
      == 4611686018427387904L)

    // strings + errors
    e.execute(
      """CREATE FUNCTION js_title(s VARCHAR) RETURNS VARCHAR
        |LANGUAGE javascript AS $$
        |function js_title(s) {
        |  return s.replace(/\w\S*/g,
        |    (t) => t.charAt(0).toUpperCase() + t.substring(1).toLowerCase());
        |}
        |$$""".stripMargin)
    assert(e.execute("SELECT js_title('hello graft WORLD') AS t")
      .as[String].head() == "Hello Graft World")

    // durable across restart
    val e2 = new Engine(spark.newSession(), wh)
    assert(e2.execute("SELECT js_clamp(99.0) AS c").head().getDouble(0) == 40.0)
  }

  test("batched relational path amortizes pipe round-trips across partitions") {
    assume(EmbeddedUdfRuntime.available("python"), "python3 not on PATH")
    val df = spark.range(0, 2000).repartition(8)
      .select(col("id"), (col("id") % 97).as("a"), lit(51L).as("b"))
    val out = EmbeddedUdf.applyBatched(df, "python", "bgcd",
      "import math\ndef bgcd(a, b):\n    return math.gcd(a, b)\n",
      Seq("a", "b"), "g", LongType, batchSize = 128)
    val got = out.select("a", "g").distinct().as[(Long, Long)]
      .collect().toMap
    (0L until 97L).foreach { a =>
      assert(got(a) == BigInt(a).gcd(BigInt(51)).toLong, s"gcd($a, 51)")
    }
  }

  test("a dead interpreter respawns: the next call succeeds") {
    assume(EmbeddedUdfRuntime.available("python"), "python3 not on PATH")
    // force EVERY pooled worker slot to die once: os._exit mid-call kills
    // the process; the runtime respawns and retries, and the retry dies
    // too, so the call fails — but the pool must come back clean after
    (1 to 8).foreach { _ =>
      intercept[Exception] {
        EmbeddedUdfRuntime.call("python", "suicide",
          "import os\ndef suicide(x):\n    os._exit(1)\n",
          Seq(1L), LongType)
      }
    }
    // fresh workers answer normally
    assert(EmbeddedUdfRuntime.call("python", "ok",
      "def ok(x):\n    return x + 1\n", Seq(41L), LongType) == 42L)
  }

  test("python UDAF: create_state/accumulate/finish, grouped, durable") {
    assume(EmbeddedUdfRuntime.available("python"), "python3 not on PATH")
    val wh = tmpDir("pyudaf")
    val e = new Engine(spark, wh)
    e.execute("CREATE TABLE samples (id BIGINT PRIMARY KEY, g VARCHAR, x DOUBLE)")
    e.execute(
      """INSERT INTO samples VALUES
        |(1, 'a', 2.0), (2, 'a', 8.0), (3, 'b', 3.0), (4, 'b', 9.0),
        |(5, 'b', 27.0)""".stripMargin)
    e.execute("FLUSH")
    // geometric mean — not a Spark builtin, order-insensitive
    e.execute(
      """CREATE AGGREGATE py_geomean(x DOUBLE) RETURNS DOUBLE
        |LANGUAGE python AS $$
        |import math
        |def create_state():
        |    return (0.0, 0)
        |def accumulate(s, x):
        |    return (s[0] + math.log(x), s[1] + 1) if x is not None else s
        |def finish(s):
        |    return math.exp(s[0] / s[1]) if s[1] else None
        |$$""".stripMargin)
    val got = e.execute(
      """SELECT g, py_geomean(x) AS gm FROM samples
        |GROUP BY g ORDER BY g""".stripMargin)
      .as[(String, Double)].collect().toSeq
    assert(got.map(_._1) == Seq("a", "b"))
    assert(math.abs(got(0)._2 - 4.0) < 1e-9)  // sqrt(2*8)
    assert(math.abs(got(1)._2 - 9.0) < 1e-9)  // cbrt(3*9*27)

    // distributed partial aggregation: many partitions, one group
    spark.range(1, 101).repartition(16)
      .selectExpr("id", "CAST(id AS DOUBLE) AS x")
      .createOrReplaceTempView("hundred")
    val one = e.execute("SELECT py_geomean(x) AS gm FROM hundred")
      .as[Double].head()
    val expected = math.exp((1 to 100).map(v => math.log(v.toDouble)).sum / 100)
    assert(math.abs(one - expected) < 1e-9)

    // SHOW AGGREGATES lists it; durable across restart; DROP removes
    assert(e.execute("SHOW AGGREGATES").collect()
      .exists(_.getString(0) == "py_geomean"))
    val e2 = new Engine(spark.newSession(), wh)
    assert(math.abs(e2.execute(
      "SELECT py_geomean(x) AS gm FROM (SELECT 4.0 AS x UNION ALL SELECT 16.0)")
      .as[Double].head() - 8.0) < 1e-9)
    e2.execute("DROP AGGREGATE py_geomean")
    intercept[Exception] {
      e2.execute("SELECT py_geomean(1.0) AS x").collect()
    }
  }

  test("javascript UDAF folds through accumulate") {
    assume(EmbeddedUdfRuntime.available("javascript"), "node not on PATH")
    val e = new Engine(spark, tmpDir("jsudaf"))
    e.execute(
      """CREATE AGGREGATE js_bitor(x BIGINT) RETURNS BIGINT
        |LANGUAGE javascript AS $$
        |function create_state() { return 0n; }
        |function accumulate(s, x) { return BigInt(s) | BigInt(x); }
        |$$""".stripMargin)
    spark.range(0, 64).repartition(8).createOrReplaceTempView("bits")
    assert(e.execute("SELECT js_bitor(id) AS m FROM bits")
      .head().getLong(0) == 63L)
  }

  test("python UDTF: RETURNS TABLE generator in LATERAL VIEW") {
    assume(EmbeddedUdfRuntime.available("python"), "python3 not on PATH")
    val wh = tmpDir("pyudtf")
    val e = new Engine(spark, wh)
    e.execute(
      """CREATE FUNCTION py_split(s VARCHAR) RETURNS TABLE(word VARCHAR, pos BIGINT)
        |LANGUAGE python AS $$
        |def py_split(s):
        |    for i, w in enumerate(s.split()):
        |        yield (w, i)
        |$$""".stripMargin)
    Seq((1L, "hello graft world"), (2L, "delta join"))
      .toDF("id", "txt").createOrReplaceTempView("docs")
    val got = e.execute(
      """SELECT id, t.word, t.pos FROM docs
        |LATERAL VIEW py_split(txt) t AS word, pos
        |ORDER BY id, pos""".stripMargin)
      .as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((1L, "hello", 0L), (1L, "graft", 1L),
      (1L, "world", 2L), (2L, "delta", 0L), (2L, "join", 1L)))

    // pg_proc lists it; durable across restart; DROP FUNCTION removes
    assert(e.execute(
      "SELECT proname FROM pg_catalog.pg_proc WHERE proname = 'py_split'")
      .count() == 1)
    val s2 = spark.newSession()
    val e2 = new Engine(s2, wh)
    s2.createDataFrame(Seq((1L, "a b"))).toDF("id", "txt")
      .createOrReplaceTempView("docs2")
    assert(e2.execute(
      """SELECT t.word FROM docs2 LATERAL VIEW py_split(txt) t AS word, pos
        |ORDER BY t.pos""".stripMargin).as[String].collect().toSeq
      == Seq("a", "b"))
    e2.execute("DROP FUNCTION py_split")
    intercept[Exception] {
      e2.execute(
        "SELECT t.word FROM docs2 LATERAL VIEW py_split(txt) t AS word, pos")
        .collect()
    }
  }

  test("javascript UDTF returns row arrays") {
    assume(EmbeddedUdfRuntime.available("javascript"), "node not on PATH")
    val e = new Engine(spark, tmpDir("jsudtf"))
    e.execute(
      """CREATE FUNCTION js_steps(n BIGINT) RETURNS TABLE(i BIGINT, sq BIGINT)
        |LANGUAGE javascript AS $$
        |function js_steps(n) {
        |  const out = [];
        |  for (let i = 0; i < n; i++) out.push([i, i * i]);
        |  return out;
        |}
        |$$""".stripMargin)
    spark.sql("SELECT 1 AS one").createOrReplaceTempView("onerow")
    val got = e.execute(
      """SELECT t.i, t.sq FROM onerow
        |LATERAL VIEW js_steps(4) t AS i, sq ORDER BY t.i""".stripMargin)
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((0L, 0L), (1L, 1L), (2L, 4L), (3L, 9L)))
  }

  test("python UDF inside a chained streaming MV maintains under DML") {
    assume(EmbeddedUdfRuntime.available("python"), "python3 not on PATH")
    val wh = tmpDir("pyudfmv")
    val e = new Engine(spark, wh)
    e.execute(
      """CREATE FUNCTION py_tier(x BIGINT) RETURNS VARCHAR
        |LANGUAGE python AS $$
        |def py_tier(x):
        |    return 'hi' if x >= 50 else 'lo'
        |$$""".stripMargin)
    e.execute("CREATE TABLE readings (id BIGINT PRIMARY KEY, v BIGINT)")
    e.execute(
      """CREATE MATERIALIZED VIEW tiered (PRIMARY KEY (id)) AS
        |SELECT id, py_tier(v) AS tier, v FROM readings""".stripMargin)
    e.execute("INSERT INTO readings VALUES (1, 10), (2, 60)")
    e.execute("FLUSH")
    assert(e.table("tiered").orderBy("id")
      .select("id", "tier").as[(Long, String)].collect().toSeq
      == Seq((1L, "lo"), (2L, "hi")))
    // an UPDATE that flips the python-computed value propagates as
    // a U-/U+ pair through the chain
    e.execute("UPDATE readings SET v = 99 WHERE id = 1")
    e.execute("DELETE FROM readings WHERE id = 2")
    e.execute("FLUSH")
    assert(e.table("tiered").orderBy("id")
      .select("id", "tier").as[(Long, String)].collect().toSeq
      == Seq((1L, "hi")))
    e.streamingJob("tiered").foreach(_.stop())
  }

  test("CREATE OR REPLACE re-defines the body on live workers") {
    assume(EmbeddedUdfRuntime.available("python"), "python3 not on PATH")
    val e = new Engine(spark, tmpDir("pyudf3"))
    e.execute(
      """CREATE FUNCTION py_ver(x BIGINT) RETURNS BIGINT
        |LANGUAGE python AS $$
        |def py_ver(x):
        |    return x + 1
        |$$""".stripMargin)
    assert(e.execute("SELECT py_ver(1) AS v").head().getLong(0) == 2L)
    e.execute(
      """CREATE OR REPLACE FUNCTION py_ver(x BIGINT) RETURNS BIGINT
        |LANGUAGE python AS $$
        |def py_ver(x):
        |    return x + 100
        |$$""".stripMargin)
    assert(e.execute("SELECT py_ver(1) AS v").head().getLong(0) == 101L)
  }
}
