package graft

import java.math.BigInteger

import org.apache.spark.sql.functions._

import graft.plans.Int256Ops

/** rw_int256 — true 256-bit vectors no SQL oracle can check (DuckDB
  * tops out at HUGEINT/int128; the in-range lane is DuckDB-gated by
  * q_int256 / q_int256_agg). Pins the reference's own semantics:
  * num256.rs hex test vectors (64 f's == -1, min/max), overflow
  * errors, PG truncating division, and the order-preserving encoding
  * under Spark's NATIVE binary comparison/min/max/sort.
  */
class Int256Spec extends SparkSpecBase {

  private val MaxVal = BigInteger.ONE.shiftLeft(255).subtract(BigInteger.ONE)
  private val MinVal = BigInteger.ONE.shiftLeft(255).negate()

  test("encode/decode round-trips across the full range") {
    val vs = Seq(BigInteger.ZERO, BigInteger.ONE, BigInteger.ONE.negate(),
      MaxVal, MinVal, new BigInteger("-98765432109876543210987654321"),
      BigInteger.ONE.shiftLeft(200).add(BigInteger.valueOf(3)))
    vs.foreach { v => assert(Int256Ops.decode(Int256Ops.encode(v)) == v) }
  }

  test("encoding preserves numeric order under unsigned-lex byte compare") {
    val sorted = Seq(MinVal, new BigInteger("-340282366920938463463374607431768211456"),
      BigInteger.valueOf(-2), BigInteger.ZERO, BigInteger.valueOf(7),
      BigInteger.ONE.shiftLeft(128), MaxVal)
    val enc = sorted.map(Int256Ops.encode)
    // pairwise: byte-wise unsigned comparison must agree with numeric
    enc.sliding(2).foreach { case Seq(a, b) =>
      assert(java.util.Arrays.compareUnsigned(a, b) < 0)
    }
  }

  test("256-bit arithmetic: (2^200+3)*5, overflow, division semantics") {
    val a = Int256Ops.encode(BigInteger.ONE.shiftLeft(200).add(BigInteger.valueOf(3)))
    val five = Int256Ops.fromLong(5L)
    val prod = Int256Ops.decode(Int256Ops.mul(a, five))
    assert(prod == BigInteger.ONE.shiftLeft(200).multiply(BigInteger.valueOf(5))
      .add(BigInteger.valueOf(15)))
    // MAX + 1 errors (reference: checked arithmetic, no wrap)
    val max = Int256Ops.encode(MaxVal)
    intercept[ArithmeticException](Int256Ops.add(max, Int256Ops.fromLong(1L)))
    intercept[ArithmeticException](Int256Ops.neg(Int256Ops.encode(MinVal)))
    // PG division: truncation toward zero, remainder takes dividend sign
    def l(x: Long) = Int256Ops.fromLong(x)
    assert(Int256Ops.decode(Int256Ops.div(l(-7), l(2))).longValue == -3L)
    assert(Int256Ops.decode(Int256Ops.mod(l(-7), l(2))).longValue == -1L)
    assert(Int256Ops.decode(Int256Ops.div(l(7), l(-2))).longValue == -3L)
    intercept[ArithmeticException](Int256Ops.div(l(1), l(0)))
  }

  test("hex semantics pin the reference's num256.rs vectors") {
    def hx(s: String): BigInteger =
      Int256Ops.decode(Int256Ops.fromHex(
        org.apache.spark.unsafe.types.UTF8String.fromString(s)))
    assert(hx("0x0") == BigInteger.ZERO)
    assert(hx("0x0000") == BigInteger.ZERO)
    assert(hx("0xf") == BigInteger.valueOf(15))
    assert(hx("0xff") == BigInteger.valueOf(255))
    assert(hx("0X1") == BigInteger.ONE) // uppercase prefix accepted
    // 64 f's reinterpret two's-complement: -1
    assert(hx("0x" + "f" * 64) == BigInteger.valueOf(-1))
    assert(hx("0x" + "f" * 62 + "01") == BigInteger.valueOf(-255))
    assert(hx("0x7" + "f" * 63) == MaxVal)
    assert(hx("0x8" + "0" * 63) == MinVal)
    intercept[NumberFormatException](hx("0xgggg"))
    intercept[NumberFormatException](hx("ff")) // prefix required
    // the varchar cast accepts decimal OR 0x (from_str_prefixed)
    def dec(s: String): BigInteger =
      Int256Ops.decode(Int256Ops.fromDec(
        org.apache.spark.unsafe.types.UTF8String.fromString(s)))
    assert(dec("-12345678901234567890123456789012345678901234567890") ==
      new BigInteger("-12345678901234567890123456789012345678901234567890"))
    assert(dec("0xff") == BigInteger.valueOf(255))
    intercept[NumberFormatException](dec("12abc"))
  }

  test("SQL surface: 256-bit values through sort, group-by, min/max, sum") {
    graft.plans.GraftExtensions.register(spark)
    import spark.implicits._
    // values straddling int128 and sign boundaries, with duplicates for
    // the group-by lane
    val rows = Seq(
      ("a", "-" + BigInteger.ONE.shiftLeft(140).toString),
      ("a", BigInteger.ONE.shiftLeft(200).toString),
      ("b", "-" + BigInteger.ONE.shiftLeft(140).toString),
      ("b", "5"), ("b", "-5"))
    val df = rows.toDF("g", "v")
    df.createOrReplaceTempView("big_vals")
    val out = spark.sql(
      """SELECT g, int256_text(int256_sum(int256(v))) AS s,
        |       int256_text(min(int256(v))) AS mn,
        |       int256_text(max(int256(v))) AS mx
        |FROM big_vals GROUP BY g ORDER BY g""".stripMargin).collect()
    val p200 = BigInteger.ONE.shiftLeft(200)
    val n140 = BigInteger.ONE.shiftLeft(140).negate()
    assert(out(0).getString(1) == p200.add(n140).toString)
    assert(out(0).getString(2) == n140.toString)
    assert(out(0).getString(3) == p200.toString)
    assert(out(1).getString(1) == n140.toString) // -2^140 + 5 - 5
    assert(out(1).getString(2) == n140.toString)
    assert(out(1).getString(3) == "5")
    // ORDER BY an int256 column is numeric (native binary sort)
    val sorted = spark.sql(
      """SELECT v FROM (SELECT int256(v) AS k, v FROM big_vals)
        |ORDER BY k""".stripMargin).collect().map(_.getString(0))
    assert(sorted.take(2).forall(_ == n140.toString))
    assert(sorted.last == p200.toString)
    // sum over all-null / empty input is NULL (PG)
    val nul = spark.sql(
      "SELECT int256_sum(int256(CAST(NULL AS STRING))) AS s FROM big_vals")
      .collect()(0)
    assert(nul.isNullAt(0))
    // avg rewrites to float8 sum/count (reference general.rs `rewritten`)
    val av = spark.sql(
      "SELECT int256_avg(int256(v)) AS a FROM big_vals WHERE g = 'b'")
      .collect()(0)
    assert(math.abs(av.getDouble(0) - (n140.doubleValue / 3.0)) <
      math.abs(n140.doubleValue) * 1e-12)
  }

  test("int256_sum maintains incrementally through a chained MV under DML") {
    val wh = tmpDir("int256mv")
    val e = new Engine(spark, wh)
    val p200 = BigInteger.ONE.shiftLeft(200)
    e.execute("SET streaming_parallelism = 2")
    e.execute("CREATE TABLE i2_t (k BIGINT PRIMARY KEY, g VARCHAR, v VARCHAR)")
    e.execute(
      "CREATE MATERIALIZED VIEW i2_mv (PRIMARY KEY (g)) AS " +
        "SELECT g, int256_text(int256_sum(int256(v))) AS s " +
        "FROM i2_t GROUP BY g")
    e.execute(s"INSERT INTO i2_t VALUES (1, 'a', '$p200'), " +
      "(2, 'a', '5'), (3, 'b', '-7')")
    e.execute("FLUSH")
    def img(): Map[String, String] =
      e.execute("SELECT g, s FROM i2_mv").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(img() == Map(
      "a" -> p200.add(BigInteger.valueOf(5)).toString, "b" -> "-7"))
    // group-moving UPDATE + group-emptying DELETE retract correctly
    e.execute("UPDATE i2_t SET v = '6' WHERE k = 2")
    e.execute("DELETE FROM i2_t WHERE k = 3")
    e.execute("FLUSH")
    assert(img() == Map("a" -> p200.add(BigInteger.valueOf(6)).toString))
  }

  test("rw_int256 cast spellings rewrite through the engine") {
    val wh = tmpDir("int256sql")
    val e = new Engine(spark, wh)
    val r = e.execute(
      "SELECT int256_text('340282366920938463463374607431768211456'::rw_int256) AS a, " +
        "int256_text(CAST('-7' AS rw_int256)) AS b").collect()(0)
    assert(r.getString(0) == BigInteger.ONE.shiftLeft(128).toString)
    assert(r.getString(1) == "-7")
  }
}
