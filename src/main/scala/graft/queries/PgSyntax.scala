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
    },

    // SIMILAR TO pattern surface (reference similar_to_escape.rs — the
    // binder splits `x SIMILAR TO p` into `x ~ similar_to_escape(p)`;
    // graft_similar_escape is the same PG conversion) plus trim_array
    // (PG 14 / trim_array.rs) and array_transform (array_transform.rs;
    // Spark spelling `transform`). The oracle side uses the CONVERTED
    // regexes with DuckDB's regexp_full_match — DuckDB's own SIMILAR TO
    // treats the pattern as a raw regex, not the SQL %/_ surface.
    q("q_fn_pattern",
      """SELECT n_nationkey,
        |  regexp_full_match(n_name, '.*I(?:A|N).*') AS sim1,
        |  NOT regexp_full_match(n_name, 'A.*') AS sim2,
        |  regexp_full_match(n_name, 'UNITED ..*') AS sim3,
        |  array_to_string(([n_nationkey, n_regionkey, 7])[1:2], ',') AS ta,
        |  array_to_string(
        |    list_transform([n_nationkey, n_regionkey], x -> x * 2 + 1),
        |    ',') AS tx
        |FROM nation ORDER BY n_nationkey""".stripMargin) { s =>
      s.sql(
        """SELECT n_nationkey,
          |  n_name RLIKE graft_similar_escape('%I(A|N)%') AS sim1,
          |  n_name NOT RLIKE graft_similar_escape('A%') AS sim2,
          |  n_name RLIKE graft_similar_escape('UNITED _%') AS sim3,
          |  array_join(
          |    trim_array(array(n_nationkey, n_regionkey, 7), 1), ',') AS ta,
          |  array_join(
          |    transform(array(n_nationkey, n_regionkey), x -> x * 2 + 1),
          |    ',') AS tx
          |FROM nation ORDER BY n_nationkey""".stripMargin)
    }
  )
}
