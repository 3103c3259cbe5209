package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PG-dialect formatting shims — the to_char surface
  * (reference: src/expr/impl/src/scalar/to_char.rs). PG format masks are
  * translated to Spark datetime patterns at plan time; only the masks a
  * PG app commonly uses are mapped (extend the table as needed).
  */
object PgFunctions {

  // ordered longest-first so e.g. HH24 wins over HH
  private val masks: Seq[(String, String)] = Seq(
    "YYYY" -> "yyyy", "YY" -> "yy",
    "MM" -> "MM", "DD" -> "dd",
    "HH24" -> "HH", "HH12" -> "hh", "HH" -> "hh",
    "MI" -> "mm", "SS" -> "ss", "MS" -> "SSS",
    "AM" -> "a", "PM" -> "a",
    "Day" -> "EEEE", "Dy" -> "EEE",
    "Month" -> "MMMM", "Mon" -> "MMM")

  /** Translate a PG to_char mask into a Spark pattern. Two-pass token
    * substitution: a naive sequential replace would re-match the OUTPUT
    * of an earlier rule (HH24→HH, then HH→hh).
    */
  private[graft] def translateMask(pg: String): String = {
    val ordered = masks.sortBy(-_._1.length)
    val SEP = '\u0001'
    var out = pg
    ordered.zipWithIndex.foreach { case ((mask, _), idx) =>
      out = out.replace(mask, SEP + idx.toString + SEP)
    }
    ordered.zipWithIndex.foreach { case ((_, sparkPat), idx) =>
      out = out.replace(SEP + idx.toString + SEP, sparkPat)
    }
    out
  }

  /** to_char(timestamp, 'YYYY-MM-DD HH24:MI:SS') — PG masks. */
  def toChar(ts: Column, pgMask: String): Column =
    date_format(ts, translateMask(pgMask))

  /** to_timestamp(text, mask) with PG masks. */
  def toTimestampPg(s: Column, pgMask: String): Column =
    to_timestamp(s, translateMask(pgMask))

  /** PG bool rendering: 't' / 'f'. */
  def boolOut(b: Column): Column = when(b, "t").when(!b, "f")
}
