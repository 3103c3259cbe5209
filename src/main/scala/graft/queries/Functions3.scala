package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Third scalar-function sweep — SURVEY.md §2.8 families not yet covered
  * by Functions/Functions2: string_to_array/split (string_to_array.rs),
  * edit distance, initcap, width_bucket (math), char/octet/bit length
  * (length.rs), position (position.rs), greatest/least, URL parsing
  * (the curation-pipeline primitive behind domain filters).
  *
  * Oracle notes: DuckDB 1.0 lacks initcap/width_bucket/char_length — the
  * oracle emulates them with list lambdas / CASE arithmetic; the emulation
  * is exact (no float boundary ambiguity: acctbal has 2 decimals, bucket
  * edges are integral).
  */
object Functions3 extends QueryPack {

  val queries: Seq[GraftQuery] = Seq(
    // split / string_to_array / split_part / initcap.
    // reference: src/expr/impl/src/scalar/{string_to_array,split_part}.rs
    q("q_fn_split",
      """SELECT p_partkey,
        |  array_to_string(string_split(p_name, 'e'), '|') AS sp,
        |  array_to_string(string_split_regex(p_name, '\s+'), '|') AS rsp,
        |  CAST(len(string_split(p_name, ' ')) AS INT) AS np,
        |  split_part(p_name, ' ', 1) AS w1,
        |  split_part(p_name, ' ', 2) AS w2,
        |  array_to_string(list_transform(string_split(lower(p_name), ' '),
        |    t -> CASE WHEN length(t) = 0 THEN t
        |              ELSE upper(t[1]) || t[2:] END), ' ') AS ic
        |FROM part WHERE p_partkey < 300 ORDER BY p_partkey""".stripMargin) { s =>
      s.table("part").where(col("p_partkey") < 300)
        .select(col("p_partkey"),
          array_join(split(col("p_name"), "e"), "|").as("sp"),
          array_join(split(col("p_name"), "\\s+"), "|").as("rsp"),
          size(split(col("p_name"), " ")).as("np"),
          expr("split_part(p_name, ' ', 1)").as("w1"),
          expr("split_part(p_name, ' ', 2)").as("w2"),
          initcap(col("p_name")).as("ic"))
        .orderBy("p_partkey")
    },

    // Edit distance (fuzzy-dedup primitive). Both engines implement
    // Levenshtein natively. reference: similarity ops are expressed via
    // UDFs in the reference; Spark has it built in.
    q("q_fn_strdist",
      """SELECT p_partkey,
        |  CAST(levenshtein(p_name, p_brand) AS INT) AS lev_brand,
        |  CAST(levenshtein(p_name, reverse(p_name)) AS INT) AS lev_rev,
        |  CAST(levenshtein(p_type, 'ECONOMY') AS INT) AS lev_type
        |FROM part WHERE p_partkey < 300 ORDER BY p_partkey""".stripMargin) { s =>
      s.table("part").where(col("p_partkey") < 300)
        .select(col("p_partkey"),
          levenshtein(col("p_name"), col("p_brand")).as("lev_brand"),
          levenshtein(col("p_name"), reverse(col("p_name"))).as("lev_rev"),
          levenshtein(col("p_type"), lit("ECONOMY")).as("lev_type"))
        .orderBy("p_partkey")
    },

    // width_bucket / length family / position / greatest-least.
    // reference: src/expr/impl/src/scalar/{length,position}.rs; math.
    q("q_fn_misc",
      """SELECT s_suppkey,
        |  CASE WHEN s_acctbal < 0 THEN 0
        |       WHEN s_acctbal >= 10000 THEN 11
        |       ELSE CAST(floor(s_acctbal / 1000.0) + 1 AS BIGINT) END AS wb,
        |  CAST(length(s_name) AS INT) AS cl,
        |  CAST(octet_length(encode(s_name)) AS INT) AS ol,
        |  CAST(bit_length(s_name) AS INT) AS bl,
        |  CAST(strpos(s_name, '#') AS INT) AS pos,
        |  CAST(greatest(s_nationkey, s_suppkey % 25) AS INT) AS gr,
        |  CAST(least(s_nationkey, s_suppkey % 25) AS INT) AS le
        |FROM supplier ORDER BY s_suppkey""".stripMargin) { s =>
      s.table("supplier")
        .select(col("s_suppkey"),
          expr("width_bucket(s_acctbal, 0D, 10000D, 10)").as("wb"),
          expr("char_length(s_name)").as("cl"),
          expr("octet_length(s_name)").as("ol"),
          expr("bit_length(s_name)").as("bl"),
          locate("#", col("s_name")).as("pos"),
          greatest(col("s_nationkey"), (col("s_suppkey") % 25).cast(IntegerType)).as("gr"),
          least(col("s_nationkey"), (col("s_suppkey") % 25).cast(IntegerType)).as("le"))
        .orderBy("s_suppkey")
    },

    // Quantified comparisons over arrays — `x op ALL/ANY(arr)` with
    // PostgreSQL three-valued logic (false dominates, then NULL, then
    // true; empty → ALL true / ANY false). Spark's forall/exists HOFs
    // implement exactly this lattice; the oracle spells it as explicit
    // CASE logic. reference: e2e_test/batch/basic/all_any_some.slt.part
    q("q_fn_quantified",
      """SELECT p_partkey,
        |  CASE WHEN len(list_filter(arr, e -> NOT(25 >= e))) > 0 THEN false
        |       WHEN len(list_filter(arr, e -> (25 >= e) IS NULL)) > 0 THEN NULL
        |       ELSE true END AS ge_all,
        |  CASE WHEN len(list_filter(arr, e -> p_size > e)) > 0 THEN true
        |       WHEN len(list_filter(arr, e -> (p_size > e) IS NULL)) > 0 THEN NULL
        |       ELSE false END AS gt_any,
        |  CASE WHEN len(list_filter(arr, e -> 10 = e)) > 0 THEN true
        |       WHEN len(list_filter(arr, e -> (10 = e) IS NULL)) > 0 THEN NULL
        |       ELSE false END AS eq_any,
        |  true AS all_empty
        |FROM (
        |  SELECT p_partkey, p_size,
        |    [p_size, 10, CASE WHEN p_partkey % 3 = 0 THEN NULL ELSE 20 END] AS arr
        |  FROM part WHERE p_partkey < 300
        |) ORDER BY p_partkey""".stripMargin) { s =>
      s.table("part").where(col("p_partkey") < 300)
        .withColumn("arr", array(col("p_size"), lit(10),
          when(col("p_partkey") % 3 === 0, lit(null)).otherwise(lit(20))
            .cast(IntegerType)))
        .select(col("p_partkey"),
          forall(col("arr"), e => lit(25) >= e).as("ge_all"),
          exists(col("arr"), e => col("p_size") > e).as("gt_any"),
          exists(col("arr"), e => lit(10) === e).as("eq_any"),
          forall(array().cast(ArrayType(IntegerType)), e => lit(1) < e)
            .as("all_empty"))
        .orderBy("p_partkey")
    },

    // Crypto family (reference: src/expr/impl/src/scalar/{md5,sha,encrypt}.rs):
    // digest parity where both engines implement the algorithm, and an
    // AES encrypt→decrypt roundtrip (DuckDB has no AES, so the oracle
    // states the identity the roundtrip must satisfy).
    q("q_fn_crypto",
      """SELECT n_nationkey,
        |  md5(n_name) AS m,
        |  sha256(n_name) AS s2,
        |  n_name AS aes_rt
        |FROM nation ORDER BY n_nationkey""".stripMargin) { s =>
      s.table("nation").select(col("n_nationkey"),
        md5(col("n_name")).as("m"),
        sha2(col("n_name"), 256).as("s2"),
        expr("CAST(aes_decrypt(aes_encrypt(CAST(n_name AS BINARY), " +
          "'0123456789abcdef'), '0123456789abcdef') AS STRING)").as("aes_rt"))
        .orderBy("n_nationkey")
    },

    // Exact decimal arithmetic (the reference's rw_int256/decimal lane),
    // carried entirely in BIGINT integer cents / milli-units: addition in
    // cents, multiplication by 1.1 as cents*11 milli-units, division as
    // cents*10000 floor-div 7, modulo 97 as cents mod 9700. Every value is
    // exact, and neither engine ever materializes a DECIMAL in the result
    // (decimal rendering differs across readers, integer cents never do).
    q("q_fn_decimal",
      """SELECT o_orderkey,
        |  c + c AS d_add_cents,
        |  c * 11 AS d_mul_milli,
        |  c * 10000 // 7 AS d_div6,
        |  c % 9700 AS d_mod_cents
        |FROM (
        |  SELECT o_orderkey,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |  FROM orders WHERE o_orderkey < 400
        |) ORDER BY o_orderkey""".stripMargin) { s =>
      val c = col("o_totalprice").cast(DecimalType(18, 2))
        .multiply(lit(100)).cast(LongType)
      s.table("orders").where(col("o_orderkey") < 400)
        .select(col("o_orderkey"), c.as("c"))
        .select(col("o_orderkey"),
          (col("c") + col("c")).as("d_add_cents"),
          (col("c") * 11).as("d_mul_milli"),
          expr("c * 10000 div 7").as("d_div6"),
          (col("c") % 9700).as("d_mod_cents"))
        .orderBy("o_orderkey")
    },

    // URL parsing — the domain-filter primitive of corpus curation.
    // Spark parse_url vs a regexp oracle (DuckDB has no URL parser).
    q("q_fn_url",
      """SELECT doc_id, url,
        |  regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
        |  regexp_extract(url, '^[a-z]+://[^/]+([^?#]*)', 1) AS path,
        |  regexp_extract(url, '[?&]q=([^&]*)', 1) AS qp,
        |  regexp_extract(url, '^([a-z]+)://', 1) AS proto
        |FROM (
        |  SELECT doc_id,
        |    concat('https://ex', doc_id % 5, '.com/p/', doc_id,
        |           '?q=', lang, '&r=', doc_id % 3) AS url
        |  FROM documents WHERE doc_id < 150
        |) ORDER BY doc_id""".stripMargin) { s =>
      s.table("documents").where(col("doc_id") < 150)
        .withColumn("url",
          expr("concat('https://ex', doc_id % 5, '.com/p/', doc_id, '?q=', lang, '&r=', doc_id % 3)"))
        .select(col("doc_id"), col("url"),
          expr("parse_url(url, 'HOST')").as("host"),
          expr("parse_url(url, 'PATH')").as("path"),
          expr("parse_url(url, 'QUERY', 'q')").as("qp"),
          expr("parse_url(url, 'PROTOCOL')").as("proto"))
        .orderBy("doc_id")
    },

    // Timestamptz / AT TIME ZONE (reference: src/expr/impl/src/scalar/
    // timestamptz.rs — timestamp↔timestamptz conversion in a named zone).
    // Both sides are spelled session-timezone-independently: the oracle
    // pins the interpretation with a double timezone() conversion, Spark
    // uses from_utc_timestamp/to_utc_timestamp. Dates are midnight UTC, so
    // no value ever lands in a DST-ambiguous wall-clock window.
    q("q_fn_timestamptz",
      """SELECT o_orderkey,
        |  strftime(timezone('America/New_York', timezone('UTC', o_orderdate::TIMESTAMP)),
        |           '%Y-%m-%d %H:%M:%S') AS nyt,
        |  strftime(timezone('Asia/Kolkata', timezone('UTC', o_orderdate::TIMESTAMP)),
        |           '%Y-%m-%d %H:%M:%S') AS ist,
        |  strftime(timezone('UTC', timezone('Europe/Paris', o_orderdate::TIMESTAMP)),
        |           '%Y-%m-%d %H:%M:%S') AS utc_of_paris,
        |  CAST(epoch(timezone('UTC', o_orderdate::TIMESTAMP)) AS BIGINT) AS ep
        |FROM orders WHERE o_orderkey < 400 ORDER BY o_orderkey""".stripMargin) { s =>
      val ts = col("o_orderdate").cast(TimestampType)
      s.table("orders").where(col("o_orderkey") < 400)
        .select(col("o_orderkey"),
          date_format(from_utc_timestamp(ts, "America/New_York"),
            "yyyy-MM-dd HH:mm:ss").as("nyt"),
          date_format(from_utc_timestamp(ts, "Asia/Kolkata"),
            "yyyy-MM-dd HH:mm:ss").as("ist"),
          date_format(to_utc_timestamp(ts, "Europe/Paris"),
            "yyyy-MM-dd HH:mm:ss").as("utc_of_paris"),
          unix_timestamp(ts).as("ep"))
        .orderBy("o_orderkey")
    },

    // jsonb construction (reference: src/expr/impl/src/scalar/
    // {jsonb_build,jsonb_object,to_jsonb,jsonb_contains}.rs):
    // jsonb_build_object → to_json(struct), to_jsonb(anyarray) →
    // to_json(array), jsonb_object(text map) → to_json(map), containment
    // via a from_json round-trip (parse → array_contains), proving the
    // serialized form is machine-readable, not just rendered.
    q("q_fn_jsonb_build",
      """SELECT n_nationkey,
        |  to_json(struct_pack(k := n_name, r := n_regionkey))::VARCHAR AS jb,
        |  to_json([n_regionkey, n_nationkey])::VARCHAR AS ja,
        |  to_json(map {'name': n_name, 'rk': n_regionkey::VARCHAR})::VARCHAR AS jo,
        |  CAST(list_contains([n_regionkey, n_nationkey], n_nationkey % 7) AS BOOLEAN) AS jc
        |FROM nation ORDER BY n_nationkey""".stripMargin) { s =>
      s.table("nation")
        .select(col("n_nationkey"),
          to_json(struct(col("n_name").as("k"), col("n_regionkey").as("r"))).as("jb"),
          to_json(array(col("n_regionkey"), col("n_nationkey"))).as("ja"),
          to_json(map(lit("name"), col("n_name"),
            lit("rk"), col("n_regionkey").cast(StringType))).as("jo"),
          array_contains(
            from_json(to_json(array(col("n_regionkey"), col("n_nationkey"))),
              ArrayType(IntegerType)),
            col("n_nationkey") % 7).as("jc"))
        .orderBy("n_nationkey")
    },

    // Array surgery family (reference: src/expr/impl/src/scalar/
    // array_{positions,remove,min_max,...}.rs): position (0 when
    // absent), prepend/append, remove, min/max, slice, null compaction,
    // and the three set operations — all rendered to ':'-joined strings
    // for engine-neutral hashing.
    q("q_fn_array2",
      """SELECT n_nationkey,
        |  CAST(coalesce(list_position([n_nationkey % 5, n_regionkey, 7], 7), 0) AS BIGINT) AS pos7,
        |  array_to_string(list_prepend(99, [n_nationkey, n_regionkey]), ':') AS pre,
        |  array_to_string(list_append([n_nationkey, n_regionkey], 99), ':') AS app,
        |  coalesce(array_to_string(list_filter([n_nationkey % 3, 1, n_regionkey], x -> x <> 1), ':'), '') AS rem1,
        |  CAST(list_min([n_nationkey, n_regionkey, 7]) AS INT) AS amin,
        |  CAST(list_max([n_nationkey, n_regionkey, 7]) AS INT) AS amax,
        |  array_to_string(list_slice([n_nationkey, n_regionkey, 7, 8], 2, 3), ':') AS sl,
        |  array_to_string(list_filter([n_nationkey, nullif(n_regionkey, 2), 5], x -> x IS NOT NULL), ':') AS cmp,
        |  array_to_string(list_sort(list_distinct([n_nationkey % 5, n_regionkey] || [n_regionkey, 3])), ':') AS uni,
        |  coalesce(array_to_string(list_sort(list_filter(list_distinct([n_nationkey % 5, n_regionkey]),
        |    x -> list_contains([n_regionkey, 3], x))), ':'), '') AS inter,
        |  coalesce(array_to_string(list_sort(list_filter(list_distinct([n_nationkey % 5, n_regionkey]),
        |    x -> NOT list_contains([n_regionkey, 3], x))), ':'), '') AS xcept
        |FROM nation ORDER BY n_nationkey""".stripMargin) { s =>
      def str(c: org.apache.spark.sql.Column) =
        array_join(c.cast("array<string>"), ":")
      val ab = array(col("n_nationkey") % 5, col("n_regionkey"))
      val b = array(col("n_regionkey"), lit(3))
      s.table("nation").select(col("n_nationkey"),
        array_position(array(col("n_nationkey") % 5, col("n_regionkey"), lit(7)),
          7).as("pos7"),
        str(array_prepend(array(col("n_nationkey"), col("n_regionkey")), lit(99)))
          .as("pre"),
        str(array_append(array(col("n_nationkey"), col("n_regionkey")), lit(99)))
          .as("app"),
        str(array_remove(array(col("n_nationkey") % 3, lit(1), col("n_regionkey")),
          1)).as("rem1"),
        array_min(array(col("n_nationkey"), col("n_regionkey"), lit(7))).as("amin"),
        array_max(array(col("n_nationkey"), col("n_regionkey"), lit(7))).as("amax"),
        str(slice(array(col("n_nationkey"), col("n_regionkey"), lit(7), lit(8)),
          2, 2)).as("sl"),
        str(array_compact(array(col("n_nationkey"),
          nullif(col("n_regionkey"), lit(2)), lit(5)))).as("cmp"),
        str(array_sort(array_union(ab, b))).as("uni"),
        str(array_sort(array_intersect(ab, b))).as("inter"),
        str(array_sort(array_except(ab, b))).as("xcept"))
        .orderBy("n_nationkey")
    },

    // hyperbolic trig + factorial + gcd/lcm (reference: math functions in
    // src/expr/impl/src/scalar/{trigonometric,arithmetic_op}.rs; gcd/lcm
    // are the graft_gcd/graft_lcm NATIVE codegen expressions — Spark has
    // no builtin). DuckDB 1.0 lacks the hyperbolics — the oracle uses the
    // exp/ln definitions; round(...,6) absorbs the ≤1-ULP libm-vs-formula
    // divergence per the determinism rules.
    q("q_fn_math2",
      """SELECT p_partkey,
        |  round((exp(p_size / 10.0) - exp(-(p_size / 10.0))) / 2.0, 6) AS sh,
        |  round((exp(p_size / 10.0) + exp(-(p_size / 10.0))) / 2.0, 6) AS ch,
        |  round((exp(2.0 * p_size / 10.0) - 1.0)
        |      / (exp(2.0 * p_size / 10.0) + 1.0), 6) AS th,
        |  round(ln(p_size / 10.0 + sqrt(p_size * p_size / 100.0 + 1.0)), 6) AS ash,
        |  round(ln(1.0 + p_size / 10.0
        |    + sqrt((1.0 + p_size / 10.0) * (1.0 + p_size / 10.0) - 1.0)), 6) AS ach,
        |  round(0.5 * ln((1.0 + p_size / 100.0) / (1.0 - p_size / 100.0)), 6) AS ath,
        |  CAST(factorial(p_size % 15) AS BIGINT) AS fact,
        |  CAST(gcd(p_partkey, p_size) AS BIGINT) AS g,
        |  CAST(lcm(p_size, p_partkey % 7 + 1) AS BIGINT) AS l
        |FROM part WHERE p_partkey < 400 ORDER BY p_partkey""".stripMargin) { s =>
      s.table("part").where(col("p_partkey") < 400).select(col("p_partkey"),
        round(sinh(col("p_size") / 10.0), 6).as("sh"),
        round(cosh(col("p_size") / 10.0), 6).as("ch"),
        round(tanh(col("p_size") / 10.0), 6).as("th"),
        round(asinh(col("p_size") / 10.0), 6).as("ash"),
        round(acosh(col("p_size") / 10.0 + 1.0), 6).as("ach"),
        round(atanh(col("p_size") / 100.0), 6).as("ath"),
        factorial(col("p_size") % 15).as("fact"),
        expr("graft_gcd(p_partkey, p_size)").as("g"),
        expr("graft_lcm(p_size, p_partkey % 7 + 1)").as("l"))
        .orderBy("p_partkey")
    }
  )
}
