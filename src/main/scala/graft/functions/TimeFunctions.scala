package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TIME-type shim. Spark has no time-of-day type (SURVEY.md §1.2); the
  * reference's `Time` maps to a LongType of microseconds since midnight
  * with these helpers (reference: src/common/src/types/mod.rs Time).
  */
object TimeFunctions {

  val MicrosPerDay = 86400000000L
  val MicrosPerHour = 3600000000L
  val MicrosPerMinute = 60000000L
  val MicrosPerSecond = 1000000L

  /** Time-of-day (µs since midnight, UTC) of a timestamp. */
  def timeOfDay(ts: Column): Column =
    pmod(unix_micros(ts), lit(MicrosPerDay))

  /** make_time(h, m, s) → µs since midnight. */
  def makeTime(h: Column, m: Column, s: Column): Column =
    h.cast(LongType) * MicrosPerHour + m.cast(LongType) * MicrosPerMinute +
      (s.cast(DoubleType) * MicrosPerSecond).cast(LongType)

  def hourOf(time: Column): Column = (time / MicrosPerHour).cast(IntegerType)
  def minuteOf(time: Column): Column =
    pmod(time, lit(MicrosPerHour)).divide(MicrosPerMinute).cast(IntegerType)
  def secondOf(time: Column): Column =
    pmod(time, lit(MicrosPerMinute)).divide(MicrosPerSecond).cast(IntegerType)

  /** time + interval µs, wrapping at midnight (PG TIME + INTERVAL). */
  def timeAdd(time: Column, micros: Column): Column =
    pmod(time + micros, lit(MicrosPerDay))

  /** Render as HH:MM:SS (for display/interop). */
  def timeToString(time: Column): Column =
    concat(
      lpad(hourOf(time).cast(StringType), 2, "0"), lit(":"),
      lpad(minuteOf(time).cast(StringType), 2, "0"), lit(":"),
      lpad(secondOf(time).cast(StringType), 2, "0"))
}
