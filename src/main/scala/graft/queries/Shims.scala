package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.{JsonFunctions, PgFunctions, TimeFunctions}

/** Dialect shims — SURVEY.md §7.1 "custom (thin)": the TIME type carrier
  * (µs since midnight) and jsonb mutation functions, each oracle-checked
  * against DuckDB's native TIME/JSON behavior.
  */
object Shims extends QueryPack {

  val queries: Seq[GraftQuery] = Seq(
    // TIME type shim: time-of-day extraction, make_time, wrap-around
    // arithmetic, HH:MM:SS rendering.
    q("q_fn_time",
      """SELECT event_id,
        |  epoch_us(ts) % 86400000000 AS tod,
        |  CAST((epoch_us(ts) % 86400000000) // 3600000000 AS INT) AS hh,
        |  CAST(((epoch_us(ts) % 86400000000) % 3600000000) // 60000000 AS INT) AS mi,
        |  CAST(((epoch_us(ts) % 86400000000) % 60000000) // 1000000 AS INT) AS ss,
        |  (10 * 3600000000 + 30 * 60000000 + CAST(15.5 * 1000000 AS BIGINT)) AS mk,
        |  ((epoch_us(ts) % 86400000000) + 2 * 3600000000) % 86400000000 AS shifted,
        |  lpad(CAST((epoch_us(ts) % 86400000000) // 3600000000 AS VARCHAR), 2, '0')
        |    || ':' ||
        |  lpad(CAST(((epoch_us(ts) % 86400000000) % 3600000000) // 60000000 AS VARCHAR), 2, '0')
        |    || ':' ||
        |  lpad(CAST(((epoch_us(ts) % 86400000000) % 60000000) // 1000000 AS VARCHAR), 2, '0') AS hhmmss
        |FROM events WHERE event_id < 300 ORDER BY event_id""".stripMargin) { s =>
      val tod = TimeFunctions.timeOfDay(col("ts"))
      s.table("events").where(col("event_id") < 300)
        .select(col("event_id"),
          tod.as("tod"),
          TimeFunctions.hourOf(tod).as("hh"),
          TimeFunctions.minuteOf(tod).as("mi"),
          TimeFunctions.secondOf(tod).as("ss"),
          TimeFunctions.makeTime(lit(10), lit(30), lit(15.5)).as("mk"),
          TimeFunctions.timeAdd(tod, lit(2 * TimeFunctions.MicrosPerHour)).as("shifted"),
          TimeFunctions.timeToString(tod).as("hhmmss"))
        .orderBy("event_id")
    },

    // PG to_char masks translated at plan time (+ PG bool rendering).
    q("q_fn_tochar",
      """SELECT o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS full_ts,
        |  strftime(o_orderdate, '%d/%m/%Y') AS dmy,
        |  strftime(o_orderdate, '%Y') || '-Q' ||
        |    CAST(extract(quarter FROM o_orderdate) AS VARCHAR) AS yq,
        |  CASE WHEN o_totalprice > 200000 THEN 't' ELSE 'f' END AS big_flag
        |FROM orders WHERE o_orderkey < 300 ORDER BY o_orderkey""".stripMargin) { s =>
      s.table("orders").where(col("o_orderkey") < 300)
        .select(col("o_orderkey"),
          PgFunctions.toChar(col("o_orderdate"), "YYYY-MM-DD HH24:MI:SS").as("full_ts"),
          PgFunctions.toChar(col("o_orderdate"), "DD/MM/YYYY").as("dmy"),
          concat(PgFunctions.toChar(col("o_orderdate"), "YYYY"), lit("-Q"),
            quarter(col("o_orderdate")).cast("string")).as("yq"),
          PgFunctions.boolOut(col("o_totalprice") > 200000).as("big_flag"))
        .orderBy("o_orderkey")
    },

    // jsonb mutation: set / delete / concat (merge) / object_keys,
    // compared via post-mutation extraction (raw JSON text would expose
    // engine-specific key ordering).
    q("q_fn_json_mutate",
      """SELECT event_id,
        |  json_extract_string(json_merge_patch(props, '{"k2": "5"}'), '$.k2') AS set_k2,
        |  json_extract_string(json_merge_patch(props, '{"k2": "5"}'), '$.k') AS keep_k,
        |  json_extract_string(json_merge_patch(props, '{"k": null}'), '$.k') AS del_k,
        |  json_extract_string(json_merge_patch(props, '{"z": "9"}'), '$.z') AS concat_z,
        |  array_to_string(list_sort(json_keys(props)), ',') AS keys
        |FROM events WHERE event_id < 200 ORDER BY event_id""".stripMargin) { s =>
      val p = col("props")
      s.table("events").where(col("event_id") < 200)
        .select(col("event_id"),
          JsonFunctions.jsonbGetText(
            JsonFunctions.jsonbSet(p, lit("k2"), lit("5")), "k2").as("set_k2"),
          JsonFunctions.jsonbGetText(
            JsonFunctions.jsonbSet(p, lit("k2"), lit("5")), "k").as("keep_k"),
          JsonFunctions.jsonbGetText(
            JsonFunctions.jsonbDelete(p, lit("k")), "k").as("del_k"),
          JsonFunctions.jsonbGetText(
            JsonFunctions.jsonbConcat(p, lit("""{"z": "9"}""")), "z").as("concat_z"),
          array_join(JsonFunctions.jsonbObjectKeys(p), ",").as("keys"))
        .orderBy("event_id")
    },

    // PG quoting + format(): quote_ident / quote_literal lexical rules
    // and the %s/%I/%L/%% format specifiers compiled to one concat at
    // plan time (reference: src/expr/impl/src/scalar/format.rs). The
    // oracle spells out the identical quoting formulas in SQL.
    q("q_fn_quote",
      """SELECT n_nationkey,
        |  CASE WHEN regexp_matches(lower(n_name), '^[a-z_][a-z0-9_]*$')
        |       THEN lower(n_name)
        |       ELSE '"' || replace(lower(n_name), '"', '""') || '"' END
        |    AS qi_lower,
        |  '"' || n_name || '"' AS qi_upper,
        |  '"' || lower(n_name) || ' x"' AS qi_space,
        |  '''' || replace(n_name || '''s', '''', '''''') || '''' AS ql,
        |  'NULL' AS ql_null,
        |  'hello ' || n_name || ', col "' || lower(n_name) || ' c" = ''' ||
        |    n_name || ''' (100%)' AS fmt
        |FROM nation ORDER BY n_nationkey""".stripMargin) { s =>
      import graft.functions.PgFunctions._
      s.table("nation")
        .select(col("n_nationkey"),
          quoteIdent(lower(col("n_name"))).as("qi_lower"),
          quoteIdent(col("n_name")).as("qi_upper"),
          quoteIdent(concat(lower(col("n_name")), lit(" x"))).as("qi_space"),
          quoteLiteral(concat(col("n_name"), lit("'s"))).as("ql"),
          formatPg("%L", lit(null).cast("string")).as("ql_null"),
          formatPg("hello %s, col %I = %L (100%%)",
            col("n_name"),
            concat(lower(col("n_name")), lit(" c")),
            col("n_name")).as("fmt"))
        .orderBy("n_nationkey")
    }
  )
}
