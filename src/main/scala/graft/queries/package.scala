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
}
