package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar-function surface — SURVEY.md §2.8 (the reference registers 620
  * functions across 80 files; each query below covers one family with the
  * exact DuckDB spelling on the oracle side).
  *
  * libm-implemented functions (exp/ln/trig) are rounded to ≤6 digits
  * before compare — IEEE only guarantees correct rounding for + - * /
  * sqrt, and round() itself diverges at higher scales (DuckDB rounds via
  * x*10^n double arithmetic, Spark via exact decimal expansion).
  */
object Functions extends QueryPack {

  val queries: Seq[GraftQuery] = Seq(
    // String family. reference: src/expr/impl/src/scalar/{substr,trim,...}.rs
    q("q_fn_string",
      """SELECT n_nationkey,
        |  upper(n_name) AS up, lower(n_name) AS lo,
        |  substr(n_name, 2, 3) AS sub,
        |  CAST(length(n_name) AS INT) AS len,
        |  replace(n_name, 'A', '@') AS repl,
        |  reverse(n_name) AS rev,
        |  repeat(n_name, 2) AS rep,
        |  lpad(n_name, 12, '.') AS lp, rpad(n_name, 12, '.') AS rp,
        |  trim('  x  ') AS tr, ltrim('  x') AS ltr, rtrim('x  ') AS rtr,
        |  concat(n_name, '_', CAST(n_nationkey AS VARCHAR)) AS cc,
        |  concat_ws('-', n_name, 'x') AS ccw,
        |  CAST(strpos(n_name, 'A') AS INT) AS pos,
        |  split_part(concat(n_name, ',tail'), ',', 2) AS sp,
        |  translate(n_name, 'AEI', 'aei') AS tl,
        |  CAST(ascii(n_name) AS INT) AS asc_,
        |  chr(65 + n_nationkey % 26) AS ch,
        |  starts_with(n_name, 'A') AS sw,
        |  md5(n_name) AS h5,
        |  sha256(n_name) AS h256
        |FROM nation ORDER BY n_nationkey""".stripMargin) { s =>
      s.table("nation").select(col("n_nationkey"),
        upper(col("n_name")).as("up"), lower(col("n_name")).as("lo"),
        substring(col("n_name"), 2, 3).as("sub"),
        length(col("n_name")).as("len"),
        regexp_replace(col("n_name"), "A", "@").as("repl"),
        reverse(col("n_name")).as("rev"),
        repeat(col("n_name"), 2).as("rep"),
        lpad(col("n_name"), 12, ".").as("lp"),
        rpad(col("n_name"), 12, ".").as("rp"),
        trim(lit("  x  ")).as("tr"), ltrim(lit("  x")).as("ltr"),
        rtrim(lit("x  ")).as("rtr"),
        concat(col("n_name"), lit("_"), col("n_nationkey").cast(StringType)).as("cc"),
        concat_ws("-", col("n_name"), lit("x")).as("ccw"),
        locate("A", col("n_name")).as("pos"),
        split_part(concat(col("n_name"), lit(",tail")), lit(","), lit(2)).as("sp"),
        translate(col("n_name"), "AEI", "aei").as("tl"),
        ascii(col("n_name")).as("asc_"),
        chr(lit(65) + col("n_nationkey") % 26).as("ch"),
        startswith(col("n_name"), lit("A")).as("sw"),
        md5(col("n_name").cast(BinaryType)).as("h5"),
        sha2(col("n_name").cast(BinaryType), 256).as("h256"))
        .orderBy("n_nationkey")
    },

    // Math family (exact ops unrounded; libm ops rounded to 9 digits).
    // reference: src/expr/impl/src/scalar/{arithmetic_op,round,exp}.rs
    q("q_fn_math",
      """SELECT c_custkey,
        |  abs(c_acctbal - 5000.0) AS ab,
        |  CAST(ceil(c_acctbal) AS DOUBLE) AS ce,
        |  CAST(floor(c_acctbal) AS DOUBLE) AS fl,
        |  round(c_acctbal, 1) AS rd,
        |  sqrt(abs(c_acctbal)) AS sq,
        |  round(cbrt(abs(c_acctbal)), 6) AS cb,
        |  round(exp(c_acctbal / 10000.0), 6) AS ex,
        |  round(ln(abs(c_acctbal) + 1.0), 6) AS lg,
        |  round(log10(abs(c_acctbal) + 1.0), 6) AS l10,
        |  (c_acctbal / 1000.0) * (c_acctbal / 1000.0) AS pw,
        |  mod(c_custkey, 7) AS md,
        |  CAST(sign(c_acctbal - 5000.0) AS DOUBLE) AS sg,
        |  greatest(c_acctbal, 5000.0) AS gr,
        |  least(c_acctbal, 5000.0) AS ls
        |FROM customer WHERE c_custkey < 200 ORDER BY c_custkey""".stripMargin) { s =>
      s.table("customer").where(col("c_custkey") < 200).select(col("c_custkey"),
        abs(col("c_acctbal") - 5000.0).as("ab"),
        ceil(col("c_acctbal")).cast(DoubleType).as("ce"),
        floor(col("c_acctbal")).cast(DoubleType).as("fl"),
        round(col("c_acctbal"), 1).as("rd"),
        sqrt(abs(col("c_acctbal"))).as("sq"),
        round(cbrt(abs(col("c_acctbal"))), 6).as("cb"),
        round(exp(col("c_acctbal") / 10000.0), 6).as("ex"),
        round(log(abs(col("c_acctbal")) + 1.0), 6).as("lg"),
        round(log10(abs(col("c_acctbal")) + 1.0), 6).as("l10"),
        ((col("c_acctbal") / 1000.0) * (col("c_acctbal") / 1000.0)).as("pw"),
        (col("c_custkey") % 7).as("md"),
        signum(col("c_acctbal") - 5000.0).as("sg"),
        greatest(col("c_acctbal"), lit(5000.0)).as("gr"),
        least(col("c_acctbal"), lit(5000.0)).as("ls"))
        .orderBy("c_custkey")
    },

    // Trigonometry (all rounded — libm).
    q("q_fn_trig",
      """SELECT c_custkey,
        |  round(sin(c_acctbal / 1000.0), 6) AS sn,
        |  round(cos(c_acctbal / 1000.0), 6) AS cs,
        |  round(atan(c_acctbal / 1000.0), 6) AS at,
        |  round(atan2(c_acctbal, 1000.0), 6) AS at2,
        |  round(degrees(c_acctbal / 10000.0), 6) AS dg,
        |  round(radians(c_acctbal / 100.0), 6) AS rd
        |FROM customer WHERE c_custkey < 100 ORDER BY c_custkey""".stripMargin) { s =>
      s.table("customer").where(col("c_custkey") < 100).select(col("c_custkey"),
        round(sin(col("c_acctbal") / 1000.0), 6).as("sn"),
        round(cos(col("c_acctbal") / 1000.0), 6).as("cs"),
        round(atan(col("c_acctbal") / 1000.0), 6).as("at"),
        round(atan2(col("c_acctbal"), lit(1000.0)), 6).as("at2"),
        round(degrees(col("c_acctbal") / 10000.0), 6).as("dg"),
        round(radians(col("c_acctbal") / 100.0), 6).as("rd"))
        .orderBy("c_custkey")
    },

    // Date/time family.
    // reference: src/expr/impl/src/scalar/{extract,date_trunc,to_char}.rs
    q("q_fn_datetime",
      """SELECT o_orderkey,
        |  CAST(extract(year   FROM o_orderdate) AS INT) AS yy,
        |  CAST(extract(month  FROM o_orderdate) AS INT) AS mm,
        |  CAST(extract(day    FROM o_orderdate) AS INT) AS dd,
        |  CAST(extract(hour   FROM o_orderdate) AS INT) AS hh,
        |  CAST(extract(doy    FROM o_orderdate) AS INT) AS doy,
        |  CAST(extract(quarter FROM o_orderdate) AS INT) AS qq,
        |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS t_month,
        |  CAST(date_trunc('day',   o_orderdate) AS TIMESTAMP) AS t_day,
        |  strftime(o_orderdate, '%Y-%m-%d') AS fmt,
        |  o_orderdate + INTERVAL 3 DAY AS plus3d,
        |  o_orderdate - INTERVAL 2 MONTH AS minus2m,
        |  CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS BIGINT) AS dd95,
        |  CAST(extract(epoch FROM o_orderdate) AS BIGINT) AS ep,
        |  CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS ld,
        |  make_date(2024, 1 + CAST(o_orderkey % 12 AS INT), 5) AS mk
        |FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey""".stripMargin) { s =>
      s.table("orders").where(col("o_orderkey") < 500).select(col("o_orderkey"),
        year(col("o_orderdate")).as("yy"),
        month(col("o_orderdate")).as("mm"),
        dayofmonth(col("o_orderdate")).as("dd"),
        hour(col("o_orderdate")).as("hh"),
        dayofyear(col("o_orderdate")).as("doy"),
        quarter(col("o_orderdate")).as("qq"),
        date_trunc("month", col("o_orderdate")).as("t_month"),
        date_trunc("day", col("o_orderdate")).as("t_day"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("fmt"),
        (col("o_orderdate") + expr("INTERVAL 3 DAY")).as("plus3d"),
        (col("o_orderdate") - expr("INTERVAL 2 MONTH")).as("minus2m"),
        datediff(col("o_orderdate").cast(DateType), lit("1995-01-01").cast(DateType))
          .cast(LongType).as("dd95"),
        unix_timestamp(col("o_orderdate")).as("ep"),
        last_day(col("o_orderdate").cast(DateType)).as("ld"),
        make_date(lit(2024), lit(1) + (col("o_orderkey") % 12).cast(IntegerType),
          lit(5)).as("mk"))
        .orderBy("o_orderkey")
    },

    // Conditional family: CASE / coalesce / nullif / IN / BETWEEN.
    // reference: src/expr/impl/src/scalar/{case,coalesce,in_}.rs
    q("q_fn_cond",
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice > 300000 THEN 'big'
        |       WHEN o_totalprice > 100000 THEN 'mid'
        |       ELSE 'small' END AS bucket,
        |  coalesce(nullif(o_orderstatus, 'O'), 'open') AS st,
        |  o_orderpriority IN ('1-URGENT', '2-HIGH') AS hot,
        |  o_totalprice BETWEEN 100000 AND 200000 AS band
        |FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey""".stripMargin) { s =>
      s.table("orders").where(col("o_orderkey") < 500).select(col("o_orderkey"),
        when(col("o_totalprice") > 300000, "big")
          .when(col("o_totalprice") > 100000, "mid")
          .otherwise("small").as("bucket"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open")).as("st"),
        col("o_orderpriority").isin("1-URGENT", "2-HIGH").as("hot"),
        col("o_totalprice").between(100000, 200000).as("band"))
        .orderBy("o_orderkey")
    },

    // Cast family (numeric↔numeric, string→numeric, timestamp↔date,
    // string→timestamp). reference: src/expr/impl/src/scalar/cast.rs
    // p_dec goes decimal→DOUBLE for the compare: a raw DECIMAL output
    // column reaches the driver as decimal.Decimal("x.60") on the Spark
    // side but float 'x.6' on the DuckDB side and hash-mismatches even
    // when values are identical (every other pack does the same).
    q("q_fn_cast",
      """SELECT o_orderkey,
        |  CAST(trunc(o_totalprice) AS BIGINT) AS p_long,
        |  CAST(trunc(o_totalprice) AS INT) AS p_int,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS p_dec,
        |  CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS k_roundtrip,
        |  CAST('42.5' AS DOUBLE) AS s_double,
        |  CAST(o_orderdate AS DATE) AS d,
        |  CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS d_ts,
        |  CAST('2024-03-04 05:06:07' AS TIMESTAMP) AS s_ts,
        |  CAST(o_orderkey % 2 AS BOOLEAN) AS b
        |FROM orders WHERE o_orderkey < 300 ORDER BY o_orderkey""".stripMargin) { s =>
      s.table("orders").where(col("o_orderkey") < 300).select(col("o_orderkey"),
        col("o_totalprice").cast(LongType).as("p_long"),
        col("o_totalprice").cast(IntegerType).as("p_int"),
        col("o_totalprice").cast(DecimalType(18, 2)).cast(DoubleType).as("p_dec"),
        col("o_orderkey").cast(StringType).cast(LongType).as("k_roundtrip"),
        lit("42.5").cast(DoubleType).as("s_double"),
        col("o_orderdate").cast(DateType).as("d"),
        col("o_orderdate").cast(DateType).cast(TimestampType).as("d_ts"),
        lit("2024-03-04 05:06:07").cast(TimestampType).as("s_ts"),
        (col("o_orderkey") % 2).cast(BooleanType).as("b"))
        .orderBy("o_orderkey")
    },

    // Array family (Spark higher-order functions vs DuckDB list_*).
    // Array-valued outputs are serialized to ':'-joined strings on BOTH
    // sides — the driver's pandas compare cannot sort/hash ndarray cells.
    // reference: src/expr/impl/src/scalar/array*.rs
    q("q_fn_array",
      """SELECT n_nationkey,
        |  array_to_string([n_nationkey, n_regionkey, 7], ':') AS arr,
        |  [n_nationkey, n_regionkey, 7][2] AS elem,
        |  CAST(len([n_nationkey, n_regionkey, 7]) AS INT) AS sz,
        |  list_contains([n_nationkey, n_regionkey], 3) AS has3,
        |  array_to_string(list_sort([7, n_nationkey, n_regionkey]), ':') AS sorted_,
        |  array_to_string(list_sort(list_distinct([n_regionkey, n_regionkey, n_nationkey])), ':') AS dist,
        |  array_to_string(list_transform([1, 2, 3], x -> x * n_nationkey), ':') AS xform,
        |  coalesce(array_to_string(list_filter([1, 2, 3, 4], x -> x > n_regionkey), ':'), '') AS filt,
        |  CAST(list_reduce([1, 2, 3, CAST(n_nationkey AS BIGINT)], (a, b) -> a + b) AS BIGINT) AS red,
        |  array_to_string(flatten([[n_nationkey], [n_regionkey]]), ':') AS flat,
        |  array_to_string([n_nationkey, n_regionkey], ':') AS joined
        |FROM nation ORDER BY n_nationkey""".stripMargin) { s =>
      def str(c: org.apache.spark.sql.Column) =
        array_join(c.cast("array<string>"), ":")
      s.table("nation").select(col("n_nationkey"),
        str(array(col("n_nationkey"), col("n_regionkey"), lit(7))).as("arr"),
        element_at(array(col("n_nationkey"), col("n_regionkey"), lit(7)), 2).as("elem"),
        size(array(col("n_nationkey"), col("n_regionkey"), lit(7))).as("sz"),
        array_contains(array(col("n_nationkey"), col("n_regionkey")), 3).as("has3"),
        str(array_sort(array(lit(7), col("n_nationkey"), col("n_regionkey")))).as("sorted_"),
        str(array_sort(array_distinct(
          array(col("n_regionkey"), col("n_regionkey"), col("n_nationkey"))))).as("dist"),
        str(transform(array(lit(1), lit(2), lit(3)), x => x * col("n_nationkey"))).as("xform"),
        str(filter(array(lit(1), lit(2), lit(3), lit(4)), x => x > col("n_regionkey"))).as("filt"),
        aggregate(array(lit(1L), lit(2L), lit(3L), col("n_nationkey").cast(LongType)),
          lit(0L), (a, b) => a + b).as("red"),
        str(flatten(array(array(col("n_nationkey")), array(col("n_regionkey"))))).as("flat"),
        array_join(array(col("n_nationkey").cast(StringType),
          col("n_regionkey").cast(StringType)), ":").as("joined"))
        .orderBy("n_nationkey")
    },

    // JSON family over events.props ({"k": <int>}).
    // reference: src/expr/impl/src/scalar/jsonb_*.rs
    q("q_fn_json",
      """SELECT event_id,
        |  json_extract_string(props, '$.k') AS k_str,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
        |  json_extract_string(props, '$.missing') AS k_missing,
        |  CAST(json_array_length('[1,2,3]') AS INT) AS alen
        |FROM events WHERE event_id < 300 ORDER BY event_id""".stripMargin) { s =>
      s.table("events").where(col("event_id") < 300).select(col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"),
        get_json_object(col("props"), "$.k").cast(LongType).as("k_int"),
        get_json_object(col("props"), "$.missing").as("k_missing"),
        json_array_length(lit("[1,2,3]")).as("alen"))
        .orderBy("event_id")
    },

    // Regex family.
    // reference: src/expr/impl/src/scalar/regexp.rs
    q("q_fn_regexp",
      """SELECT event_id, event_type,
        |  regexp_extract(event_type, '([a-z]+)_?([a-z]*)', 1) AS g1,
        |  regexp_replace(event_type, '[aeiou]', '*', 'g') AS repl,
        |  regexp_matches(event_type, '^p') AS m,
        |  array_to_string(string_split_regex(event_type, '[_]'), '|') AS parts
        |FROM events WHERE event_id < 200 ORDER BY event_id""".stripMargin) { s =>
      s.table("events").where(col("event_id") < 200).select(col("event_id"),
        col("event_type"),
        regexp_extract(col("event_type"), "([a-z]+)_?([a-z]*)", 1).as("g1"),
        regexp_replace(col("event_type"), "[aeiou]", "*").as("repl"),
        col("event_type").rlike("^p").as("m"),
        array_join(split(col("event_type"), "[_]"), "|").as("parts"))
        .orderBy("event_id")
    },

    // Struct/map construction + field access.
    // reference: src/common/src/types/struct_type.rs, map_type.rs
    q("q_fn_struct_map",
      """SELECT n_nationkey,
        |  to_json({'k': n_nationkey, 'nm': n_name}) AS st,
        |  struct_extract({'k': n_nationkey, 'nm': n_name}, 'nm') AS nm,
        |  array_to_string(map_keys(map {'a': n_nationkey}), ',') AS mk,
        |  array_to_string(map_values(map {'a': n_nationkey}), ',') AS mv,
        |  list_extract(map_extract(map {'a': n_nationkey, 'b': n_regionkey}, 'b'), 1) AS mb
        |FROM nation ORDER BY n_nationkey""".stripMargin) { s =>
      s.table("nation").select(col("n_nationkey"),
        to_json(struct(col("n_nationkey").as("k"), col("n_name").as("nm"))).as("st"),
        struct(col("n_nationkey").as("k"), col("n_name").as("nm"))
          .getField("nm").as("nm"),
        array_join(map_keys(map(lit("a"), col("n_nationkey"))), ",").as("mk"),
        array_join(map_values(map(lit("a"), col("n_nationkey"))).cast("array<string>"),
          ",").as("mv"),
        element_at(map(lit("a"), col("n_nationkey"), lit("b"), col("n_regionkey")),
          lit("b")).as("mb"))
        .orderBy("n_nationkey")
    }
  )
}
