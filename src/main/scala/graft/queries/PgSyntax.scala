package graft.queries

import org.apache.spark.sql.functions._

/** PG/ANSI SQL syntax forms (reference: the reference engine's PG parser
  * accepts all of these verbatim — src/frontend/src/binder/expr/):
  * `substring(x FROM i FOR n)`, `trim(BOTH/LEADING/TRAILING c FROM s)`,
  * `overlay(s PLACING r FROM i FOR n)`, `position(a IN b)`,
  * `extract(field FROM ts)`, `IS [NOT] DISTINCT FROM`, `||` concat,
  * `LIKE … ESCAPE`. The Spark side runs the SAME ANSI text through
  * Spark's parser — proving the forms parse AND compute identically;
  * the DuckDB oracle rewrites only what DuckDB lacks (overlay → substr
  * arithmetic). Divergences proven equal by value instead of form:
  * Spark's extract has no EPOCH field (unix_timestamp is the Spark
  * spelling), and DOW spells as dayofweek−1 (Spark counts Sunday=1,
  * PG/DuckDB Sunday=0).
  */
object PgSyntax extends QueryPack {

  val queries: Seq[GraftQuery] = Seq(
    q("q_fn_pgsyntax",
      """SELECT n_nationkey,
        |  substring(n_name FROM 2 FOR 3) AS sub,
        |  trim(BOTH 'A' FROM n_name) AS trb,
        |  trim(LEADING 'A' FROM n_name) AS trl,
        |  trim(TRAILING 'A' FROM n_name) AS trt,
        |  substr(n_name, 1, 1) || 'X' || substr(n_name, 3) AS ovl,
        |  CAST(position('AN' IN n_name) AS INT) AS pos,
        |  CAST(extract(epoch FROM DATE '2024-06-01') AS BIGINT) AS ep,
        |  CAST(extract(dow FROM DATE '2024-06-01') AS INT) AS dw,
        |  n_name || '-' || CAST(n_regionkey AS VARCHAR) AS cc,
        |  (n_name LIKE 'A%!%' ESCAPE '!') AS lk,
        |  (n_regionkey IS DISTINCT FROM NULL) AS dist,
        |  (NULL IS NOT DISTINCT FROM NULL) AS ndist
        |FROM nation ORDER BY n_nationkey""".stripMargin) { s =>
      s.sql(
        """SELECT n_nationkey,
          |  substring(n_name FROM 2 FOR 3) AS sub,
          |  trim(BOTH 'A' FROM n_name) AS trb,
          |  trim(LEADING 'A' FROM n_name) AS trl,
          |  trim(TRAILING 'A' FROM n_name) AS trt,
          |  overlay(n_name PLACING 'X' FROM 2 FOR 1) AS ovl,
          |  CAST(position('AN' IN n_name) AS INT) AS pos,
          |  unix_timestamp(TIMESTAMP '2024-06-01 00:00:00') AS ep,
          |  CAST(extract(dayofweek FROM DATE '2024-06-01') - 1 AS INT) AS dw,
          |  n_name || '-' || CAST(n_regionkey AS STRING) AS cc,
          |  (n_name LIKE 'A%!%' ESCAPE '!') AS lk,
          |  (n_regionkey IS DISTINCT FROM NULL) AS dist,
          |  (NULL IS NOT DISTINCT FROM NULL) AS ndist
          |FROM nation ORDER BY n_nationkey""".stripMargin)
    }
  )
}
