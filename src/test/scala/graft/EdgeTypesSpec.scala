package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Type-system corners from the reference's e2e_test/batch/types corpus
  * (FIXTURES.md §4): null struct/list/map propagation, decimal precision
  * behavior, calendar-aware interval arithmetic, TIME shim round-trip.
  */
class EdgeTypesSpec extends SparkSpecBase {
  import spark.implicits._

  test("null struct/list/map access propagates null, not error") {
    val r = spark.sql(
      """SELECT
        |  CAST(NULL AS STRUCT<a INT>).a AS s_field,
        |  element_at(CAST(NULL AS ARRAY<INT>), 1) AS l_elem,
        |  element_at(CAST(NULL AS MAP<STRING,INT>), 'k') AS m_elem,
        |  size(CAST(NULL AS ARRAY<INT>)) AS l_size""".stripMargin).head()
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
    assert(r.isNullAt(3) || r.getInt(3) == -1) // size(null): null (modern) / -1 (legacy)
  }

  test("decimal keeps exact cents where double drifts") {
    val df = (1 to 1000).map(_ => 0.1).toDF("v")
    val dec = df.agg(sum(col("v").cast(DecimalType(18, 2))).as("s"))
      .head().getDecimal(0)
    assert(dec == new java.math.BigDecimal("100.00"))
    // order-independence: decimal sum equal under repartition
    val dec2 = df.repartition(7).agg(sum(col("v").cast(DecimalType(18, 2))))
      .head().getDecimal(0)
    assert(dec2 == dec)
  }

  test("calendar interval arithmetic: month-end clamping") {
    val r = spark.sql(
      """SELECT
        |  TIMESTAMP '2024-01-31 00:00:00' + INTERVAL 1 MONTH AS feb,
        |  TIMESTAMP '2023-01-31 00:00:00' + INTERVAL 1 MONTH AS feb_ny,
        |  add_months(DATE '2024-01-31', 1) AS feb_d""".stripMargin).head()
    assert(r.getTimestamp(0).toString.startsWith("2024-02-29"))
    assert(r.getTimestamp(1).toString.startsWith("2023-02-28"))
    assert(r.getDate(2).toString == "2024-02-29")
  }

  test("TIME shim round-trips through string rendering") {
    import graft.functions.TimeFunctions._
    val t = Seq("2024-05-06 13:45:07").toDF("s")
      .select(timeOfDay(col("s").cast(TimestampType)).as("t"))
    val rendered = t.select(timeToString(col("t"))).head().getString(0)
    assert(rendered == "13:45:07")
    val wrapped = t.select(timeAdd(col("t"), lit(12 * MicrosPerHour)))
      .select(timeToString(col("*"))).head().getString(0)
    assert(wrapped == "01:45:07")
  }

  test("ANSI overflow raises instead of silently wrapping") {
    val e = intercept[Exception] {
      spark.sql("SELECT CAST(300 AS TINYINT)").collect()
    }
    assert(e.getMessage.contains("CAST_OVERFLOW") || e.getMessage.contains("overflow"))
  }
}
