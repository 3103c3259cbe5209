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

  /** PG quote_literal: single-quote the value, doubling embedded quotes
    * (reference binds PG's quote_literal through the same rule).
    */
  def quoteLiteral(s: Column): Column =
    concat(lit("'"), regexp_replace(s, "'", "''"), lit("'"))

  /** PG quote_ident: pass a safe lower-case identifier through
    * unchanged, double-quote anything else (embedded quotes doubled).
    * Safe = `[a-z_][a-z0-9_]*` — PG additionally quotes reserved
    * keywords; this shim is the lexical rule only.
    */
  def quoteIdent(s: Column): Column =
    when(s.rlike("^[a-z_][a-z0-9_]*$"), s)
      .otherwise(concat(lit("\""), regexp_replace(s, "\"", "\"\""), lit("\"")))

  /** PG format(fmt, args…) for a PLAN-TIME literal format string —
    * supports %s (plain), %I (quote_ident), %L (quote_literal; NULL →
    * the unquoted keyword NULL) and %% (reference:
    * src/expr/impl/src/scalar/format.rs parses the same specifiers).
    * The mask is compiled to one concat at plan time, so the whole call
    * stays inside whole-stage codegen.
    */
  def formatPg(fmt: String, args: Column*): Column = {
    val parts = scala.collection.mutable.ArrayBuffer[Column]()
    val sb = new StringBuilder
    var argIdx = 0
    var i = 0
    def flush(): Unit = if (sb.nonEmpty) { parts += lit(sb.toString); sb.clear() }
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '%' && i + 1 < fmt.length) {
        fmt.charAt(i + 1) match {
          case '%' => sb.append('%')
          case spec =>
            flush()
            val a = args(argIdx); argIdx += 1
            parts += (spec match {
              case 's' => a.cast("string")
              case 'I' => quoteIdent(a.cast("string"))
              case 'L' => coalesce(quoteLiteral(a.cast("string")), lit("NULL"))
              case other =>
                throw new IllegalArgumentException(
                  s"format: unsupported specifier %$other")
            })
        }
        i += 2
      } else { sb.append(c); i += 1 }
    }
    flush()
    // %s on a NULL arg renders the empty string in PG, not SQL-NULL
    concat(parts.toSeq.map(p => coalesce(p, lit(""))): _*)
  }
}
