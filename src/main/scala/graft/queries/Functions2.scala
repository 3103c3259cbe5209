package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextFunctions

/** Second scalar-function sweep — SURVEY.md §2.8 families not in the
  * first pack: left/right, printf-style formatting, base64 codecs,
  * bitwise operators, regexp_count, interval arithmetic breadth, char
  * shingles (the MinHash primitive exposed standalone).
  */
object Functions2 extends QueryPack {

  val queries: Seq[GraftQuery] = Seq(
    q("q_fn_string2",
      """SELECT n_nationkey,
        |  left(n_name, 3) AS l3, right(n_name, 3) AS r3,
        |  printf('%s-%03d', n_name, n_nationkey) AS fmt,
        |  to_base64(encode(n_name)) AS b64,
        |  CAST(from_base64(to_base64(encode(n_name))) AS VARCHAR) AS b64rt,
        |  CAST(len(regexp_extract_all(n_name, '[AEIOU]')) AS INT) AS n_vowels
        |FROM nation ORDER BY n_nationkey""".stripMargin) { s =>
      s.table("nation").select(col("n_nationkey"),
        expr("left(n_name, 3)").as("l3"),
        expr("right(n_name, 3)").as("r3"),
        format_string("%s-%03d", col("n_name"), col("n_nationkey")).as("fmt"),
        base64(col("n_name").cast(BinaryType)).as("b64"),
        unbase64(base64(col("n_name").cast(BinaryType))).cast(StringType).as("b64rt"),
        regexp_count(col("n_name"), lit("[AEIOU]")).as("n_vowels"))
        .orderBy("n_nationkey")
    },

    // third sweep: overlay / targeted trims / suffix test / hex
    q("q_fn_string3",
      """SELECT p_partkey,
        |  left(p_name, 2) || 'XX' || substr(p_name, 5) AS ov,
        |  trim('  ' || p_name || '  ') AS t,
        |  ltrim(p_name, 'abcdefgh') AS lt,
        |  ends_with(p_name, 'd') AS ew,
        |  to_hex(p_partkey) AS hx
        |FROM part WHERE p_partkey % 7 = 0 ORDER BY p_partkey""".stripMargin) { s =>
      s.table("part").where(col("p_partkey") % 7 === 0)
        .select(col("p_partkey"),
          overlay(col("p_name"), lit("XX"), lit(3), lit(2)).as("ov"),
          trim(concat(lit("  "), col("p_name"), lit("  "))).as("t"),
          expr("trim(LEADING 'abcdefgh' FROM p_name)").as("lt"),
          col("p_name").endsWith("d").as("ew"),
          hex(col("p_partkey")).as("hx"))
        .orderBy("p_partkey")
    },

    q("q_fn_bitwise",
      """SELECT o_orderkey,
        |  o_orderkey & 255 AS b_and,
        |  o_orderkey | 4096 AS b_or,
        |  xor(o_orderkey, 1365) AS b_xor,
        |  (o_orderkey % 1024) << 3 AS b_shl,
        |  o_orderkey >> 2 AS b_shr,
        |  ~o_orderkey AS b_not,
        |  CAST(bit_count(o_orderkey) AS INT) AS b_cnt
        |FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey""".stripMargin) { s =>
      s.table("orders").where(col("o_orderkey") < 500).select(col("o_orderkey"),
        col("o_orderkey").bitwiseAND(255).as("b_and"),
        col("o_orderkey").bitwiseOR(4096).as("b_or"),
        col("o_orderkey").bitwiseXOR(1365).as("b_xor"),
        shiftleft(col("o_orderkey") % 1024, 3).as("b_shl"),
        shiftright(col("o_orderkey"), 2).as("b_shr"),
        bitwise_not(col("o_orderkey")).as("b_not"),
        bit_count(col("o_orderkey")).as("b_cnt"))
        .orderBy("o_orderkey")
    },

    // Interval arithmetic breadth (minute/second/week, date+days,
    // calendar-month difference).
    q("q_fn_interval",
      """SELECT o_orderkey,
        |  o_orderdate + INTERVAL 90 MINUTE AS plus90m,
        |  o_orderdate - INTERVAL 45 SECOND AS minus45s,
        |  o_orderdate + INTERVAL 2 WEEK AS plus2w,
        |  CAST(o_orderdate AS DATE) + 30 AS plus30d,
        |  CAST((extract(year FROM o_orderdate) - 1995) * 12
        |       + extract(month FROM o_orderdate) - 1 AS BIGINT) AS months_since
        |FROM orders WHERE o_orderkey < 400 ORDER BY o_orderkey""".stripMargin) { s =>
      s.table("orders").where(col("o_orderkey") < 400).select(col("o_orderkey"),
        (col("o_orderdate") + expr("INTERVAL 90 MINUTE")).as("plus90m"),
        (col("o_orderdate") - expr("INTERVAL 45 SECOND")).as("minus45s"),
        (col("o_orderdate") + expr("INTERVAL 2 WEEK")).as("plus2w"),
        date_add(col("o_orderdate").cast(DateType), 30).as("plus30d"),
        ((year(col("o_orderdate")) - 1995) * 12 + month(col("o_orderdate")) - 1)
          .cast(LongType).as("months_since"))
        .orderBy("o_orderkey")
    },

    // Temporal filter (`WHERE ts > NOW() - interval`) with a deterministic
    // anchor: the stream's own max event time stands in for NOW().
    // reference: src/stream/src/executor/dynamic_filter.rs + now.rs
    q("q_temporal_filter",
      """SELECT event_id, ts FROM events
        |WHERE ts > (SELECT max(ts) FROM events) - INTERVAL 7 DAY
        |ORDER BY event_id""".stripMargin) { s =>
      s.sql(
        """SELECT event_id, ts FROM events
          |WHERE ts > (SELECT max(ts) FROM events) - INTERVAL 7 DAY
          |ORDER BY event_id""".stripMargin)
    },

    // Character shingles (the LSH primitive standalone): distinct 5-gram
    // count per document.
    q("q_text_shingles",
      """SELECT doc_id,
        |  CAST(len(list_distinct(CASE WHEN length(text) >= 5 THEN
        |    list_transform(range(1, length(text) - 3), i -> substr(text, i, 5))
        |    ELSE [] END)) AS INT) AS n_shingles
        |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin) { s =>
      s.table("documents").where(col("doc_id") < 100)
        .select(col("doc_id"),
          size(array_distinct(TextFunctions.charShingles(col("text"), 5)))
            .as("n_shingles"))
        .orderBy("doc_id")
    }
  )
}
