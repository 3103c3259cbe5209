package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Query-pack framework: every operator in SURVEY.md §2 is demonstrated by a
  * named query over the driver testdata, paired (when SQL-expressible) with
  * an ANSI/DuckDB oracle the driver hash-compares against.
  *
  * Authoring rules (driver compare = row/schema/hash after sorting columns
  * by name):
  *  - alias every computed column identically on both sides;
  *  - end with a total ORDER BY (unique key) so row order is deterministic
  *    in both engines;
  *  - aggregate money/qty through DECIMAL for order-independent exactness,
  *    then cast back to DOUBLE (both engines round-trip identically);
  *  - cast integer aggregates explicitly (DuckDB SUM(int) is HUGEINT).
  */
package object queries {

  final case class GraftQuery(
      name: String,
      run: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  trait QueryPack { def queries: Seq[GraftQuery] }

  /** Define a query with tables pre-registered and a DuckDB oracle. */
  def q(name: String, oracle: String)(f: SparkSession => DataFrame): GraftQuery =
    GraftQuery(name, (s, d) => { Tables.register(s, d); f(s) }, Some(oracle))

  /** Query with no SQL oracle (driver falls back to a rows-only check). */
  def qNoOracle(name: String)(f: (SparkSession, String) => DataFrame): GraftQuery =
    GraftQuery(name, (s, d) => { Tables.register(s, d); f(s, d) }, None)

  /** Oracle query whose runner also needs the data dir. */
  def qDir(name: String, oracle: String)(
      f: (SparkSession, String) => DataFrame): GraftQuery =
    GraftQuery(name, (s, d) => { Tables.register(s, d); f(s, d) }, Some(oracle))

  /** Exact, order-independent sum of a double expression: per-row cast to
    * DECIMAL (deterministic IEEE→decimal rounding in both engines), exact
    * decimal addition, single deterministic cast back to DOUBLE.
    */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DoubleType)

  /** DuckDB spelling of [[dsum]]. */
  def dsumSql(expr: String, scale: Int = 2): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(18,$scale))) AS DOUBLE)"

  /** Exact average: decimal-sum divided by count in double space. */
  def davg(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DoubleType) / count(c)

  def davgSql(expr: String, scale: Int = 2): String =
    s"(${dsumSql(expr, scale)} / COUNT($expr))"

  /** Exact decimal factors for PRODUCT sums. [[dsum]]'s per-row cast is
    * deterministic per engine but the two engines round a near-half-way
    * DOUBLE PRODUCT at scale 6 differently (Spark expands the exact
    * decimal, DuckDB scales in double space) — at millions of rows a few
    * boundary rows surface as a last-ulp sum mismatch. Casting each 2dp
    * FACTOR first is unambiguous (a 2dp double is never half-way at 2dp),
    * and the decimal product is then EXACT on both engines.
    */
  def dmoney(c: Column): Column = c.cast(DecimalType(12, 2))

  def dmoneySql(e: String): String = s"CAST(($e) AS DECIMAL(12,2))"

  /** (1 − rate) as an exact decimal factor. */
  def drate1m(c: Column): Column =
    lit(1).cast(DecimalType(4, 2)) - c.cast(DecimalType(4, 2))

  def drate1mSql(e: String): String =
    s"(CAST(1 AS DECIMAL(4,2)) - CAST(($e) AS DECIMAL(4,2)))"

  /** (1 + rate) as an exact decimal factor. */
  def drate1p(c: Column): Column =
    lit(1).cast(DecimalType(4, 2)) + c.cast(DecimalType(4, 2))

  def drate1pSql(e: String): String =
    s"(CAST(1 AS DECIMAL(4,2)) + CAST(($e) AS DECIMAL(4,2)))"

  /** The TPC-H revenue expression price × (1 − discount), exact. */
  def drev(price: Column, disc: Column): Column = dmoney(price) * drate1m(disc)

  def drevSql(p: String, d: String): String =
    s"(${dmoneySql(p)} * ${drate1mSql(d)})"

  /** [[dsum]] that stays DECIMAL on output: when the sum × 10^scale can
    * exceed 2^53 (q1's corpus-wide 6dp sums at SF ≥ 1), the final
    * decimal→double cast itself rounds the last bit differently across
    * engines — emitting the exact decimal removes the cast entirely.
    *
    * NOT for the gate surface: the driver's hash canonicalizes DECIMAL
    * differently from DOUBLE (DuckDB's pandas bridge renders DECIMAL as
    * float64 while Spark parquet keeps Decimal128), so a gate query that
    * emits DECIMAL hash-mismatches even when every value is exactly equal
    * (round-7 q1_agg regression). Use only in builder-side sf≥1 checks;
    * OutputTypeEnvelopeSpec pins the gate surface to hash-stable types.
    */
  def dsumExact(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DecimalType(38, scale))

  def dsumExactSql(expr: String, scale: Int = 2): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(18,$scale))) AS DECIMAL(38,$scale))"

  /** [[dsum]] whose final decimal→double conversion stays EXACT at any
    * realistic SF: the exact decimal sum is rounded to 2 dp IN DECIMAL
    * SPACE (both engines round the same exact value half-up), so the
    * emitted double needs only value×100 < 2⁵³ ≈ 9e13 — whereas a raw
    * 6-dp sum crosses 2⁵³ around SF 1 and the two engines' conversions
    * drift a last ulp (the CORRECTNESS_sf1 q1_agg find). Output stays
    * DOUBLE (the gate's hash-stable envelope).
    */
  def dsumMoney(c: Column, scale: Int = 6): Column =
    round(sum(c.cast(DecimalType(18, scale))), 2).cast(DoubleType)

  def dsumMoneySql(expr: String, scale: Int = 6): String =
    s"CAST(ROUND(SUM(CAST(($expr) AS DECIMAL(18,$scale))), 2) AS DOUBLE)"
}
