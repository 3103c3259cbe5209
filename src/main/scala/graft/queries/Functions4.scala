package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fourth scalar-function sweep — SURVEY.md §2.8 families not yet
  * covered: printf-style formatting (format.rs), translate/chr
  * (translate.rs, ascii), IPv4 address math (inet.rs inet_aton /
  * inet_ntoa + the CIDR operators curation pipelines filter with), and
  * keyed MACs (hmac.rs) via the native graft_hmac expression.
  *
  * Oracle notes: the inet oracle evaluates the SAME integer formulas in
  * DuckDB SQL (netmask via pow(2, 32-m) — every power of two ≤ 2^32 is
  * exact in double), so the gate checks semantics, not a shared
  * implementation. The hmac oracle pins expected digests as literals
  * (RFC 2202 'Jefe' vectors + independently generated cases) — DuckDB
  * has no hmac to recompute with.
  */
object Functions4 extends QueryPack {

  val queries: Seq[GraftQuery] = Seq(
    // printf / translate / chr / repeat / reverse / ascii.
    // reference: src/expr/impl/src/scalar/{format,translate,ascii}.rs
    q("q_fn_format",
      """SELECT p_partkey,
        |  printf('%s#%05d', p_brand, p_partkey) AS fmt,
        |  printf('%x', p_partkey) AS fmtx,
        |  translate(p_name, 'aeiou', '12345') AS tr,
        |  chr(CAST(65 + p_partkey % 26 AS INT)) AS ch,
        |  reverse(p_name) AS rev,
        |  repeat(p_brand, 2) AS rep,
        |  ascii(p_name) AS asc
        |FROM part WHERE p_partkey < 300 ORDER BY p_partkey""".stripMargin) { s =>
      s.table("part").where(col("p_partkey") < 300)
        .select(col("p_partkey"),
          format_string("%s#%05d", col("p_brand"), col("p_partkey")).as("fmt"),
          format_string("%x", col("p_partkey")).as("fmtx"),
          translate(col("p_name"), "aeiou", "12345").as("tr"),
          expr("char(65 + CAST(p_partkey % 26 AS INT))").as("ch"),
          reverse(col("p_name")).as("rev"),
          repeat(col("p_brand"), 2).as("rep"),
          ascii(col("p_name")).as("asc"))
        .orderBy("p_partkey")
    },

    // IPv4: inet_aton/inet_ntoa round-trip + CIDR masklen/network/
    // broadcast/contains over synthesized addresses.
    // reference: src/expr/impl/src/scalar/inet.rs
    q("q_fn_inet",
      """WITH src AS (
        |  SELECT c_custkey,
        |    concat_ws('.', (c_custkey % 223) + 1, (c_custkey * 7) % 256,
        |      (c_custkey * 13) % 256, (c_custkey * 29) % 256) AS ip,
        |    8 + (c_custkey % 25) AS m
        |  FROM customer WHERE c_custkey < 300),
        |n AS (
        |  SELECT c_custkey, ip, m,
        |    CAST(string_split(ip, '.')[1] AS BIGINT) * 16777216 +
        |    CAST(string_split(ip, '.')[2] AS BIGINT) * 65536 +
        |    CAST(string_split(ip, '.')[3] AS BIGINT) * 256 +
        |    CAST(string_split(ip, '.')[4] AS BIGINT) AS aton,
        |    4294967295 - (CAST(pow(2, 32 - m) AS BIGINT) - 1) AS mask
        |  FROM src)
        |SELECT c_custkey, aton,
        |  concat_ws('.', (aton // 16777216) % 256, (aton // 65536) % 256,
        |    (aton // 256) % 256, aton % 256) AS rt,
        |  CAST(m AS INT) AS mlen,
        |  concat_ws('.', ((aton & mask) // 16777216) % 256,
        |    ((aton & mask) // 65536) % 256, ((aton & mask) // 256) % 256,
        |    (aton & mask) % 256) AS net,
        |  concat_ws('.',
        |    (((aton & mask) + (4294967295 - mask)) // 16777216) % 256,
        |    (((aton & mask) + (4294967295 - mask)) // 65536) % 256,
        |    (((aton & mask) + (4294967295 - mask)) // 256) % 256,
        |    ((aton & mask) + (4294967295 - mask)) % 256) AS bc,
        |  ((168496141 & mask) = (aton & mask)) AS has
        |FROM n ORDER BY c_custkey""".stripMargin) { s =>
      import graft.functions.NetFunctions._
      val k = col("c_custkey")
      val src = s.table("customer").where(k < 300)
        .select(k,
          concat_ws(".", k % 223 + 1, k * 7 % 256, k * 13 % 256,
            k * 29 % 256).as("ip"),
          (k % 25 + 8).as("m"))
      val cidr = concat_ws("/", col("ip"), col("m"))
      src.select(k,
          inetAton(col("ip")).as("aton"),
          inetNtoa(inetAton(col("ip"))).as("rt"),
          cidrMasklen(cidr).as("mlen"),
          cidrNetwork(cidr).as("net"),
          cidrBroadcast(cidr).as("bc"),
          cidrContains(cidr, lit("10.11.12.13")).as("has"))
        .orderBy("c_custkey")
    },

    // Keyed MAC — native graft_hmac (payload, secret, algo) → hex.
    // reference: src/expr/impl/src/scalar/hmac.rs
    q("q_fn_hmac",
      """SELECT * FROM (VALUES
        |  (1, '5bdcc146bf60754e6a042426089575c75a003f089d2739839dec58b964ec3843'),
        |  (2, 'effcdf6ae5eb2fa2d27416d5f184df9c259a7c79'),
        |  (3, '750c783e6ab0b503eaa86e310a5db738'),
        |  (4, '4d88ae30a409ddfbcf962d7355f8cbf5928a221a8cbb598778b9b569c30ae75f'),
        |  (5, '22b07c2fbe2705b663515f41f8310ad4b234e8e2ec1de71f53e803e1ea021718be138c998776e6584191736d0b744fe961cc65e61ed68fc8e62a1cd909e79ee2'),
        |  (6, '7244ca86690fe2edb3c644de65388031640b1296cf62b3370904dac541ca850e')
        |) AS t(id, mac) ORDER BY id""".stripMargin) { s =>
      graft.plans.GraftExtensions.register(s)
      import s.implicits._
      Seq(
        (1, "what do ya want for nothing?", "Jefe", "sha256"),
        (2, "what do ya want for nothing?", "Jefe", "sha1"),
        (3, "what do ya want for nothing?", "Jefe", "md5"),
        (4, "graft streaming engine", "s3cr3t", "sha256"),
        (5, "graft streaming engine", "s3cr3t", "sha512"),
        (6, "", "empty-payload", "sha256"))
        .toDF("id", "payload", "secret", "algo")
        .select(col("id"),
          call_function("graft_hmac", col("payload"), col("secret"),
            col("algo")).as("mac"))
        .orderBy("id")
    },

    // PG-spelling scalar pack (reference: scalar/trigonometric.rs
    // degree variants, jsonb_info.rs probes, string.rs quote_nullable) —
    // all registered as pure compositions of codegen'd builtins
    // (plans/VectorExpressions.scala). The oracle recomputes: degree
    // trig via radians(), jsonb probes via DuckDB's json functions
    // (json_type's vocabulary mapped to PG's).
    q("q_fn_pg_misc",
      """SELECT n_nationkey,
        |  round(sin(radians(n_nationkey * 7.0)), 6) AS sd,
        |  round(cos(radians(n_nationkey * 7.0)), 6) AS cd,
        |  round(tan(radians(n_nationkey * 7.0 + 1.0)), 6) AS td,
        |  round(degrees(asin((n_nationkey % 21 - 10) / 10.0)), 6) AS asd,
        |  round(degrees(acos((n_nationkey % 21 - 10) / 10.0)), 6) AS acd,
        |  round(cos(n_nationkey + 1.5) / sin(n_nationkey + 1.5), 6) AS ct,
        |  CASE WHEN n_nationkey % 5 = 0 THEN 'NULL'
        |       ELSE '''' || n_name || '''' END AS qn,
        |  CASE json_type(CAST(CASE n_nationkey % 5
        |         WHEN 0 THEN '{"a":1}' WHEN 1 THEN '[1,2]'
        |         WHEN 2 THEN '"x"' WHEN 3 THEN 'true'
        |         ELSE '12.5' END AS JSON))
        |    WHEN 'OBJECT' THEN 'object' WHEN 'ARRAY' THEN 'array'
        |    WHEN 'VARCHAR' THEN 'string' WHEN 'BOOLEAN' THEN 'boolean'
        |    WHEN 'NULL' THEN 'null' ELSE 'number' END AS jt,
        |  CAST(json_array_length('[1,2,3,' || CAST(n_nationkey AS VARCHAR)
        |       || ']') AS INT) AS jal,
        |  json_extract_string('{"a":{"b":' || CAST(n_nationkey AS VARCHAR)
        |       || '}}', '$.a.b') AS jep,
        |  list_contains(json_keys('{"x":1,"y":2}'),
        |       CASE WHEN n_nationkey % 2 = 0 THEN 'x' ELSE 'z' END) AS je
        |FROM nation ORDER BY n_nationkey""".stripMargin) { s =>
      graft.plans.GraftExtensions.register(s)
      s.sql(
        """SELECT n_nationkey,
          |  round(sind(n_nationkey * 7.0), 6) AS sd,
          |  round(cosd(n_nationkey * 7.0), 6) AS cd,
          |  round(tand(n_nationkey * 7.0 + 1.0), 6) AS td,
          |  round(asind((n_nationkey % 21 - 10) / 10.0), 6) AS asd,
          |  round(acosd((n_nationkey % 21 - 10) / 10.0), 6) AS acd,
          |  round(cot(n_nationkey + 1.5), 6) AS ct,
          |  quote_nullable(CASE WHEN n_nationkey % 5 = 0 THEN NULL
          |                      ELSE n_name END) AS qn,
          |  jsonb_typeof(CASE n_nationkey % 5
          |    WHEN 0 THEN '{"a":1}' WHEN 1 THEN '[1,2]'
          |    WHEN 2 THEN '"x"' WHEN 3 THEN 'true'
          |    ELSE '12.5' END) AS jt,
          |  jsonb_array_length(concat('[1,2,3,', CAST(n_nationkey AS STRING),
          |    ']')) AS jal,
          |  jsonb_extract_path_text(concat('{"a":{"b":',
          |    CAST(n_nationkey AS STRING), '}}'), 'a', 'b') AS jep,
          |  jsonb_exists('{"x":1,"y":2}',
          |    CASE WHEN n_nationkey % 2 = 0 THEN 'x' ELSE 'z' END) AS je
          |FROM nation ORDER BY n_nationkey""".stripMargin)
    },

    // jsonb_object_agg (reference aggregate/jsonb_agg.rs): grouped
    // key→value JSON objects, keys sorted (jsonb object semantics). The
    // oracle builds the same text via string_agg ORDER BY — aggregate-
    // order-proof on both sides.
    q("q_jsonb_object_agg",
      """SELECT n_regionkey,
        |  '{' || string_agg('"' || n_name || '":' ||
        |         CAST(n_nationkey AS VARCHAR), ',' ORDER BY n_name) || '}' AS j
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin) { s =>
      graft.plans.GraftExtensions.register(s)
      s.sql(
        """SELECT n_regionkey, jsonb_object_agg(n_name, n_nationkey) AS j
          |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin)
    },

    // PG statistical-aggregate spellings (reference aggregate/general.rs
    // stddev_pop/stddev_samp/var_pop/var_samp) — Spark builtins under
    // the same names; quantities aggregate as small integers so the
    // 6-decimal rounding absorbs partial-order float drift.
    q("q_stat_agg3",
      """SELECT l_returnflag,
        |  round(stddev_pop(l_quantity), 6) AS sp,
        |  round(stddev_samp(l_quantity), 6) AS ss,
        |  round(var_pop(l_quantity), 6) AS vp,
        |  round(var_samp(l_quantity), 6) AS vs
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { s =>
      s.sql(
        """SELECT l_returnflag,
          |  round(stddev_pop(l_quantity), 6) AS sp,
          |  round(stddev_samp(l_quantity), 6) AS ss,
          |  round(var_pop(l_quantity), 6) AS vp,
          |  round(var_samp(l_quantity), 6) AS vs
          |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    },

    // rw_int256 scalar lane (reference: src/expr/impl/src/scalar/
    // int256.rs, src/common/src/types/num256.rs): in-cast from bigint
    // and from hex, add/mul/div/mod/neg arithmetic beyond the int64
    // range, and the float8/text out-casts. The oracle computes the
    // same values in DuckDB HUGEINT (the vectors stay inside 128 bits
    // so DuckDB can check them; true 256-bit vectors are pinned in
    // Int256Spec where no SQL oracle can follow). All arithmetic is
    // codegen'd static calls (plans/Int256Expressions.scala).
    q("q_int256",
      """SELECT n_nationkey,
        |  CAST(CAST(n_nationkey AS HUGEINT) * 1000000007
        |       * 9223372036854775807 + n_regionkey AS VARCHAR) AS wide,
        |  CAST(CAST(n_nationkey AS HUGEINT) * 77777777777 // 7
        |       AS VARCHAR) AS tdiv,
        |  CAST((n_nationkey - 12) % 5 AS VARCHAR) AS tmod,
        |  CAST(-n_nationkey AS VARCHAR) AS tneg,
        |  CAST(n_nationkey + 10 AS VARCHAR) AS thex,
        |  CAST(n_nationkey AS DOUBLE) AS tf8
        |FROM nation ORDER BY n_nationkey""".stripMargin) { s =>
      graft.plans.GraftExtensions.register(s)
      s.sql(
        """SELECT n_nationkey,
          |  int256_text(int256_add(
          |    int256_mul(int256(CAST(n_nationkey AS BIGINT) * 1000000007),
          |               int256(9223372036854775807)),
          |    int256(n_regionkey))) AS wide,
          |  int256_text(int256_div(
          |    int256_mul(int256(n_nationkey), int256(77777777777)),
          |    int256(7))) AS tdiv,
          |  int256_text(int256_mod(int256(n_nationkey - 12), int256(5))) AS tmod,
          |  int256_text(int256_neg(int256(n_nationkey))) AS tneg,
          |  int256_text(hex_to_int256(concat('0x', hex(n_nationkey + 10)))) AS thex,
          |  int256_float8(int256(n_nationkey)) AS tf8
          |FROM nation ORDER BY n_nationkey""".stripMargin)
    },

    // rw_int256 aggregation: int256_sum (DeclarativeAggregate — partial
    // agg map-side combines, merge is int256_add) plus native min/max
    // over the encoding. The min/max vectors mix signs, so an encoding
    // without the sign flip (raw two's complement under unsigned
    // lexicographic byte order) would sort negatives ABOVE positives
    // and fail the hash check — the oracle pins numeric order.
    q("q_int256_agg",
      """SELECT n_regionkey,
        |  CAST(SUM(CAST(n_nationkey AS HUGEINT) * 1000000007
        |           * 9223372036854775807) AS VARCHAR) AS s,
        |  CAST(MIN(CAST(n_nationkey - 12 AS HUGEINT)
        |           * 9223372036854775807) AS VARCHAR) AS mn,
        |  CAST(MAX(CAST(n_nationkey - 12 AS HUGEINT)
        |           * 9223372036854775807) AS VARCHAR) AS mx,
        |  CAST(COUNT(n_nationkey) AS BIGINT) AS c,
        |  round(AVG(n_nationkey), 6) AS a
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin) { s =>
      graft.plans.GraftExtensions.register(s)
      s.sql(
        """SELECT n_regionkey,
          |  int256_text(int256_sum(
          |    int256_mul(int256(CAST(n_nationkey AS BIGINT) * 1000000007),
          |               int256(9223372036854775807)))) AS s,
          |  int256_text(min(int256_mul(int256(n_nationkey - 12),
          |                             int256(9223372036854775807)))) AS mn,
          |  int256_text(max(int256_mul(int256(n_nationkey - 12),
          |                             int256(9223372036854775807)))) AS mx,
          |  CAST(count(int256(n_nationkey)) AS BIGINT) AS c,
          |  round(int256_avg(int256(n_nationkey)), 6) AS a
          |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin)
    }
  )
}
