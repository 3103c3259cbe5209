package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

class NativeExprSpec extends SparkSpecBase {
  import spark.implicits._

  test("graft_dot is registered and bit-matches the HOF dot") {
    assert(spark.catalog.functionExists("graft_dot"))
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (Array(0.1f, -0.2f, 0.3f), Array(-0.4f, 0.5f, -0.6f)))
      .toDF("a", "b")
    val rows = df.select(
      call_function("graft_dot", col("a"), col("b")).as("native"),
      VectorFunctions.hofDot(col("a"), col("b")).as("hof")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("graft_dot works in SQL and on double arrays") {
    val r = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d").head()
    assert(r.getDouble(0) == 11.0)
  }

  test("graft_dot null array yields null") {
    val r = spark.sql(
      "SELECT graft_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d))").head()
    assert(r.isNullAt(0))
  }

  test("optimizer rule rewrites the HOF dot pattern when opted in") {
    // needs a non-literal input: literals constant-fold away entirely
    val e = Tables.df(spark, "/root/testdata/sf0.001", "embeddings")
    val hof = e.select(
      VectorFunctions.hofDot(col("embedding"), col("embedding")).as("d"))
    spark.conf.set(graft.plans.NativeVectorRewrite.ConfKey, "true")
    try {
      val optimized = hof.queryExecution.optimizedPlan.toString
      assert(optimized.contains("graft_dot"), s"rewrite missing:\n$optimized")
      val native = e.select(
        call_function("graft_dot", col("embedding"), col("embedding")).as("d"))
      assert(hof.agg(sum("d")).head().getDouble(0) ==
        native.agg(sum("d")).head().getDouble(0))
    } finally spark.conf.unset(graft.plans.NativeVectorRewrite.ConfKey)
  }

  test("optimizer rule does NOT silently rewrite two-array HOF dots") {
    // a·b with distinct inputs has different edge semantics (unequal
    // lengths, null elements) — without the session opt-in the HOF
    // formulation must survive optimization untouched
    val e = Tables.df(spark, "/root/testdata/sf0.001", "embeddings")
    val two = e.as("x").join(e.as("y"),
        col("x.vec_id") === col("y.vec_id"))
      .select(VectorFunctions.hofDot(col("x.embedding"), col("y.embedding")).as("d"))
    val optimized = two.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("graft_dot"), s"unexpected rewrite:\n$optimized")
    // HOF semantics preserved: unequal lengths yield NULL, native truncates
    val r = spark.sql(
      """SELECT aggregate(zip_with(array(1.0d, 2.0d), array(3.0d),
        |  (x, y) -> x * y), 0.0d, (a, v) -> a + v) AS hof,
        |  graft_dot(array(1.0d, 2.0d), array(3.0d)) AS native""".stripMargin).head()
    assert(r.isNullAt(0) && r.getDouble(1) == 3.0)
  }

  test("fastDot used by similarity search matches oracle-checked values") {
    val vecs = Seq((0L, Array(1.0f, 0.0f)), (1L, Array(0.6f, 0.8f)))
      .toDF("vec_id", "embedding")
    val qs = vecs.select(col("vec_id").as("q"), col("embedding").as("qv"))
    val top = graft.operators.SimilaritySearch
      .bruteForceTopK(vecs, "vec_id", "embedding", qs, "q", "qv", k = 1)
      .select("qid", "id", "cos").as[(Long, Long, Double)].collect().toSet
    assert(top == Set((0L, 1L, 0.6), (1L, 0L, 0.6)))
  }

  test("graft_gcd/graft_lcm: PG semantics, int coercion, codegen path") {
    // non-literal inputs so constant folding can't bypass doGenCode
    val df = Seq((12L, 18), (0L, 0), (-4L, 6), (7L, 0), (270L, 192))
      .toDF("a", "b")
    val got = df.select(
      call_function("graft_gcd", col("a"), col("b")).as("g"),
      call_function("graft_lcm", col("a"), col("b")).as("l"))
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((6L, 36L), (0L, 0L), (2L, 12L), (7L, 0L), (6L, 8640L)))
    assert(spark.sql("SELECT graft_gcd(NULL, 3L)").head().isNullAt(0))
    assert(spark.sql("SELECT graft_lcm(21, 6)").head().getLong(0) == 42L)
    // lcm overflow raises (PG errors too) instead of wrapping
    intercept[Exception] {
      Seq((Long.MaxValue - 1, Long.MaxValue - 2)).toDF("a", "b")
        .selectExpr("graft_lcm(a, b)").collect()
    }
  }

  test("graft_hmac: RFC 2202/4231 'Jefe' vectors, codegen path, errors") {
    // non-literal inputs so constant folding can't bypass doGenCode
    val df = Seq(
      ("what do ya want for nothing?", "Jefe", "sha1"),
      ("what do ya want for nothing?", "Jefe", "sha256"),
      ("what do ya want for nothing?", "Jefe", "md5"))
      .toDF("p", "k", "a")
    val got = df.select(
      call_function("graft_hmac", col("p"), col("k"), col("a")).as("m"))
      .as[String].collect().toSeq
    assert(got == Seq(
      "effcdf6ae5eb2fa2d27416d5f184df9c259a7c79",
      "5bdcc146bf60754e6a042426089575c75a003f089d2739839dec58b964ec3843",
      "750c783e6ab0b503eaa86e310a5db738"))
    assert(spark.sql("SELECT graft_hmac(NULL, 'k', 'sha256')")
      .head().isNullAt(0))
    // unknown algorithm raises, mirroring the reference's bind rejection
    intercept[Exception] {
      Seq(("x", "k", "sha42")).toDF("p", "k", "a")
        .selectExpr("graft_hmac(p, k, a)").collect()
    }
  }

  test("graft_similar_escape: PG SIMILAR TO pattern → anchored regex") {
    // non-literal inputs so constant folding can't bypass doGenCode
    val df = Seq(("%abc%", "\\"), ("x_y", "\\"), ("a(b|c)+", "\\"),
      ("t#%t", "#"), ("a.b$", "\\")).toDF("p", "e")
    val got = df.select(
      call_function("graft_similar_escape", col("p"), col("e")).as("r"))
      .as[String].collect().toSeq
    assert(got == Seq("^(?:.*abc.*)$", "^(?:x.y)$", "^(?:a(?:b|c)+)$",
      "^(?:t\\%t)$", "^(?:a\\.b\\$)$"))
    // 1-arg form defaults to backslash escaping
    assert(spark.sql("SELECT graft_similar_escape('x_%')").head()
      .getString(0) == "^(?:x..*)$")
    // >1-char escape raises (PG's "invalid escape string")
    intercept[Exception] {
      Seq(("a", "##")).toDF("p", "e")
        .selectExpr("graft_similar_escape(p, e)").collect()
    }
    // PG's escape-double-quote separators bound the substring capture
    assert(spark.sql("SELECT graft_similar_escape('%#\"o_b#\"%', '#')")
      .head().getString(0) == "^(?:.*){1,1}?(o.b){1,1}(?:.*)$")
  }

  test("SIMILAR TO / trim_array / array_transform SQL through the engine") {
    val e = new Engine(spark, tmpDir("similarto"))
    e.execute("CREATE TABLE st (k BIGINT PRIMARY KEY, s VARCHAR)")
    e.execute("INSERT INTO st VALUES (1,'abc'), (2,'a%c'), (3,'xbz'), (4,'ABC')")
    def ks(q: String) = e.execute(q).collect().map(_.getLong(0)).toSet
    assert(ks("SELECT k FROM st WHERE s SIMILAR TO 'a%'") == Set(1L, 2L))
    assert(ks("SELECT k FROM st WHERE s SIMILAR TO '(a|x)b(c|z)'") ==
      Set(1L, 3L))
    assert(ks("SELECT k FROM st WHERE s NOT SIMILAR TO 'a%'") == Set(3L, 4L))
    assert(ks("SELECT k FROM st WHERE s SIMILAR TO 'a#%c' ESCAPE '#'") ==
      Set(2L))
    assert(ks("SELECT k FROM st WHERE s SIMILAR TO '_b_'") == Set(1L, 3L))
    // reference array_transform lambda spelling |x| → Spark transform
    assert(e.execute("SELECT array_transform(array(1, 2, 3), |x| x * 2) AS a")
      .head().getSeq[Int](0) == Seq(2, 4, 6))
    assert(e.execute("SELECT trim_array(array(1, 2, 3, 4), 2) AS a")
      .head().getSeq[Int](0) == Seq(1, 2))
    // || concat is untouched by the lambda rewrite
    assert(e.execute("SELECT s || '!' AS c FROM st WHERE k = 1")
      .head().getString(0) == "abc!")
  }

  test("quote_ident / quote_literal / format: PG semantics in SQL") {
    def s1(q: String): String = spark.sql(q).head().getString(0)
    assert(s1("SELECT quote_ident('simple_name')") == "simple_name")
    assert(s1("SELECT quote_ident('Mixed Case')") == "\"Mixed Case\"")
    assert(s1("SELECT quote_ident('has\"quote')") == "\"has\"\"quote\"")
    assert(s1("SELECT quote_literal('plain')") == "'plain'")
    assert(s1("SELECT quote_literal(\"it's\")") == "'it''s'")
    assert(s1("SELECT quote_literal(42)") == "'42'")
    assert(s1("SELECT format('%s-%s', 'a', 7)") == "a-7")
    assert(s1("SELECT format('sel %I from t where c = %L', 'My Col', 'v''x')")
      == "sel \"My Col\" from t where c = 'v''x'")
    assert(s1("SELECT format('100%% of %s', 'x')") == "100% of x")
    assert(s1("SELECT format('%L', CAST(NULL AS STRING))") == "NULL")
    assert(s1("SELECT format('[%s]', CAST(NULL AS STRING))") == "[]")
    // through the engine surface too (pgwire users hit this registry)
    val e = new Engine(spark, tmpDir("pgquote"))
    assert(e.execute("SELECT format('%I = %L', 'Weird Id', 'val') AS f")
      .head().getString(0) == "\"Weird Id\" = 'val'")
  }

  test("pg_typeof reports the PG spelling of the resolved type") {
    def s1(q: String): String = spark.sql(q).head().getString(0)
    assert(s1("SELECT pg_typeof(1L)") == "bigint")
    assert(s1("SELECT pg_typeof(1)") == "integer")
    assert(s1("SELECT pg_typeof('x')") == "text")
    assert(s1("SELECT pg_typeof(1.5D)") == "double precision")
    assert(s1("SELECT pg_typeof(CAST(1 AS DECIMAL(10,2)))") == "numeric")
    assert(s1("SELECT pg_typeof(DATE '2024-01-01')") == "date")
    assert(s1("SELECT pg_typeof(true)") == "boolean")
    assert(s1("SELECT pg_typeof(array(1L, 2L))") == "bigint[]")
    // foldable: constant folding collapses it before execution
    val plan = spark.sql("SELECT pg_typeof(1L) AS t")
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("bigint"), s"expected folded literal:\n$plan")
  }

  test("to_char: PG datetime masks over SQL; numeric surface untouched") {
    def s1(q: String): String = spark.sql(q).head().getString(0)
    assert(s1("SELECT to_char(TIMESTAMP '2024-03-07 14:05:09', " +
      "'YYYY-MM-DD HH24:MI:SS')") == "2024-03-07 14:05:09")
    assert(s1("SELECT to_char(DATE '2024-03-07', 'DD/MM/YYYY')")
      == "07/03/2024")
    assert(s1("SELECT to_char(TIMESTAMP '2024-03-07 14:05:09', 'HH12:MI AM')")
      .matches("02:05 (PM|pm)"))
    // numeric to_char still routes to Spark's number formatter
    assert(s1("SELECT to_char(1234.56, '9999.99')").trim == "1234.56")
    // and through the engine (pgwire users)
    val e = new Engine(spark, tmpDir("pgtochar"))
    assert(e.execute(
      "SELECT to_char(TIMESTAMP '2024-01-02 03:04:05', 'YYYY/MM/DD') AS t")
      .head().getString(0) == "2024/01/02")
  }

  test("sha224/sha384 pin the public NIST 'abc' vectors") {
    graft.plans.GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT sha224(CAST('abc' AS BINARY)) AS a, " +
        "sha384(CAST('abc' AS BINARY)) AS b").head()
    assert(r.getString(0) ==
      "23097d223405d8228642a477bda255b32aadbce4bda0b3f7e36c9da7")
    assert(r.getString(1) ==
      "cb00753f45a35e8bb5a03d699ac65007272c32ab0eded1631a8b605a43ff5bed" +
        "8086072ba1e7cc2358baeca134c825a7")
  }

  test("convert_from/convert_to round-trip encodings") {
    graft.plans.GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT convert_from(convert_to('grüße', 'UTF-8'), 'UTF-8') AS s," +
        " convert_from(convert_to('plain', 'US-ASCII'), 'US-ASCII') AS p").head()
    assert(r.getString(0) == "grüße")
    assert(r.getString(1) == "plain")
  }

  test("map function spellings over MapType builtins") {
    graft.plans.GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT map_length(m) AS len,
        |  map_access(m, 'a') AS a,
        |  map_contains(m, 'b') AS hasb,
        |  map_contains(m, 'z') AS hasz,
        |  map_access(map_cat(m, map('c', 3)), 'c') AS c,
        |  map_access(map_insert(m, 'd', 4), 'd') AS d,
        |  map_length(map_delete(m, 'a')) AS dl
        |FROM (SELECT map('a', 1, 'b', 2) AS m)""".stripMargin).head()
    assert(r.getInt(0) == 2 && r.getInt(1) == 1)
    assert(r.getBoolean(2) && !r.getBoolean(3))
    assert(r.getInt(4) == 3 && r.getInt(5) == 4 && r.getInt(6) == 1)
  }

  test("jsonb_exists_any/all and coth/cotd") {
    graft.plans.GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT jsonb_exists_any('{"x":1,"y":2}', array('y', 'z')) AS any1,
        |  jsonb_exists_any('{"x":1}', array('q')) AS any0,
        |  jsonb_exists_all('{"x":1,"y":2}', array('x', 'y')) AS all1,
        |  jsonb_exists_all('{"x":1,"y":2}', array('x', 'q')) AS all0,
        |  coth(1.0d) AS ch, cotd(45.0d) AS cd""".stripMargin).head()
    assert(r.getBoolean(0) && !r.getBoolean(1))
    assert(r.getBoolean(2) && !r.getBoolean(3))
    assert(math.abs(r.getDouble(4) - 1.0 / math.tanh(1.0)) < 1e-12)
    assert(math.abs(r.getDouble(5) - 1.0) < 1e-12)
  }

  test("make_timestamptz rewrites to make_timestamp through the engine") {
    val e = new Engine(spark, tmpDir("mkts"))
    val r = e.execute(
      "SELECT make_timestamptz(2024, 3, 15, 10, 30, 0.5) AS t").head()
    assert(r.getTimestamp(0).toInstant.toString.startsWith("2024-03-15T10:30:00.5"))
  }

  test("jsonb_object_agg maintains through a chained MV under DML") {
    val e = new Engine(spark, tmpDir("joagg"))
    e.execute("SET streaming_parallelism = 2")
    e.execute("CREATE TABLE jo_t (k BIGINT PRIMARY KEY, g VARCHAR, v BIGINT)")
    e.execute("CREATE MATERIALIZED VIEW jo_mv (PRIMARY KEY (g)) AS " +
      "SELECT g, jsonb_object_agg(concat('k', k), v) AS j FROM jo_t GROUP BY g")
    e.execute("INSERT INTO jo_t VALUES (1, 'a', 10), (2, 'a', 20), (3, 'b', 30)")
    e.execute("FLUSH")
    def img(): Map[String, String] =
      e.execute("SELECT g, j FROM jo_mv").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(img() == Map("a" -> """{"k1":10,"k2":20}""", "b" -> """{"k3":30}"""))
    e.execute("DELETE FROM jo_t WHERE k = 2")
    e.execute("UPDATE jo_t SET v = 31 WHERE k = 3")
    e.execute("FLUSH")
    assert(img() == Map("a" -> """{"k1":10}""", "b" -> """{"k3":31}"""))
  }

  test("pg_sleep sleeps in the task and returns NULL") {
    graft.plans.GraftExtensions.register(spark)
    val t0 = System.nanoTime()
    val r = spark.sql("SELECT pg_sleep(0.3) AS v").head()
    assert((System.nanoTime() - t0) / 1e9 >= 0.3)
    assert(r.isNullAt(0))
  }

  test("pg_get_keywords breadth and catcode vocabulary via the engine") {
    val e = new Engine(spark, tmpDir("pgkw"))
    val rows = e.execute(
      "SELECT catcode, count(*) AS n FROM pg_get_keywords() GROUP BY catcode")
      .collect()
    assert(rows.map(_.getString(0)).forall(Set("U", "R")))
    assert(rows.map(_.getLong(1)).sum > 300)
  }
}
