package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Multimodal

/** Inventory gap-fill: right outer/semi/anti joins, explicit GROUPING
  * SETS, LIKE/ILIKE, null-handling functions, distinct collecting agg,
  * and the multimodal feature pipeline as a driver-visible query.
  */
object Gaps extends QueryPack {

  val queries: Seq[GraftQuery] = Seq(
    // Right outer join (RightOuter in plan_common.proto JoinType).
    q("q_join_right",
      """SELECT n.n_nationkey, n.n_name, s.s_suppkey FROM
        |  (SELECT * FROM supplier WHERE s_acctbal > 9000) s
        |RIGHT JOIN nation n ON s.s_nationkey = n.n_nationkey
        |ORDER BY n_nationkey, s_suppkey NULLS FIRST""".stripMargin) { s =>
      val sup = s.table("supplier").where(col("s_acctbal") > 9000)
      val n = s.table("nation")
      sup.join(n, sup("s_nationkey") === n("n_nationkey"), "right")
        .select(n("n_nationkey"), n("n_name"), sup("s_suppkey"))
        .orderBy(col("n_nationkey").asc, col("s_suppkey").asc_nulls_first)
    },

    // Right semi / right anti = swapped-side semi/anti (the reference's
    // RightSemi/RightAnti JoinTypes; Spark spells them from the other
    // side, which is the planner-level identity).
    q("q_join_right_semi",
      """SELECT n_nationkey, n_name FROM nation n
        |WHERE EXISTS (SELECT 1 FROM supplier s
        |              WHERE s.s_nationkey = n.n_nationkey AND s.s_acctbal > 9500)
        |ORDER BY n_nationkey""".stripMargin) { s =>
      val sup = s.table("supplier").where(col("s_acctbal") > 9500)
      val n = s.table("nation")
      n.join(sup, n("n_nationkey") === sup("s_nationkey"), "left_semi")
        .select("n_nationkey", "n_name")
        .orderBy("n_nationkey")
    },

    // Explicit GROUPING SETS (not derivable from rollup/cube shorthand).
    q("q_grouping_sets",
      """SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { s =>
      s.sql(
        """SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS n
          |FROM lineitem
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
          |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)
    },

    // LIKE family (rewrite_like_expr rule analog — Catalyst's
    // LikeSimplification turns prefix patterns into StartsWith).
    q("q_fn_like",
      """SELECT p_partkey, p_name FROM part
        |WHERE p_name LIKE 'small%' OR p_name LIKE '%bolt%' OR p_name ILIKE '%GEAR%'
        |ORDER BY p_partkey""".stripMargin) { s =>
      val p = s.table("part")
      p.where(col("p_name").like("small%") || col("p_name").like("%bolt%")
          || col("p_name").ilike("%GEAR%"))
        .select("p_partkey", "p_name")
        .orderBy("p_partkey")
    },

    // Null-handling surface: IS [NOT] NULL, nullif, nvl/ifnull, NaN.
    q("q_fn_null",
      """SELECT id,
        |  v IS NULL AS is_n, v IS NOT NULL AS is_nn,
        |  coalesce(v, -1.0) AS c,
        |  nullif(tag, 'x') AS ni,
        |  isnan(nanv) AS nan_flag,
        |  CASE WHEN isnan(nanv) THEN 0.0 ELSE nanv END AS nanvl_
        |FROM (SELECT * FROM (VALUES
        |  (1, 1.5, 'x', 1.0),
        |  (2, CAST(NULL AS DOUBLE), 'y', CAST('NaN' AS DOUBLE)),
        |  (3, 2.5, 'x', 3.0)) AS t(id, v, tag, nanv))
        |ORDER BY id""".stripMargin) { s =>
      import s.implicits._
      val df = Seq(
        (1, Some(1.5), "x", 1.0),
        (2, None: Option[Double], "y", Double.NaN),
        (3, Some(2.5), "x", 3.0)).toDF("id", "v", "tag", "nanv")
      df.select(col("id"),
        col("v").isNull.as("is_n"), col("v").isNotNull.as("is_nn"),
        coalesce(col("v"), lit(-1.0)).as("c"),
        nullif(col("tag"), lit("x")).as("ni"),
        isnan(col("nanv")).as("nan_flag"),
        nanvl(col("nanv"), lit(0.0)).as("nanvl_"))
        .orderBy("id")
    },

    // DISTINCT collecting aggregate (serialized for the pandas compare).
    q("q_array_agg_distinct",
      """SELECT c_nationkey,
        |  array_to_string(list_sort(list(DISTINCT c_mktsegment)), '|') AS segs
        |FROM customer WHERE c_nationkey < 8
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin) { s =>
      s.table("customer").where(col("c_nationkey") < 8)
        .groupBy("c_nationkey")
        .agg(array_join(array_sort(collect_set(col("c_mktsegment"))), "|").as("segs"))
        .orderBy("c_nationkey")
    },

    // Multimodal feature pipeline with REAL pure-JVM codecs: each row
    // synthesizes actual PPM (P6) / WAV (PCM16) bytes from a closed-form
    // formula of doc_id, parses them back with the real header-walking
    // decoders, and emits exact integer features. The oracle recomputes
    // the same features from the generating formula (bounded series join
    // — max 224 pixels / 89 samples per asset), so a decode bug anywhere
    // in the binary path breaks the hash.
    q("q_multimodal_features",
      """WITH ids AS (SELECT doc_id AS a FROM documents),
        |ser AS (SELECT i FROM generate_series(0, 255) t(i)),
        |img AS (
        |  SELECT a AS asset_id, CAST('image' AS VARCHAR) AS modality,
        |         CAST(8 + a % 9 AS INTEGER) AS width, CAST(8 + a % 7 AS INTEGER) AS height,
        |         CAST(sum((a*31 + 3*i) % 256) AS BIGINT) AS sum_r,
        |         CAST(sum((a*17 + 5*i) % 256) AS BIGINT) AS sum_g,
        |         CAST(sum((a*7 + 11*i) % 256) AS BIGINT) AS sum_b
        |  FROM ids JOIN ser ON i < (8 + a % 9) * (8 + a % 7)
        |  WHERE a % 2 = 0 GROUP BY a),
        |aud AS (
        |  SELECT a AS asset_id, CAST('audio' AS VARCHAR) AS modality,
        |         CAST(8000 + (a % 4) * 4000 AS INTEGER) AS sample_rate,
        |         CAST(40 + a % 50 AS BIGINT) AS n_samples,
        |         CAST(sum((a*131 + 37*i) % 2001 - 1000) AS BIGINT) AS sum_amp,
        |         CAST(max(abs((a*131 + 37*i) % 2001 - 1000)) AS INTEGER) AS peak
        |  FROM ids JOIN ser ON i < 40 + a % 50
        |  WHERE a % 2 = 1 GROUP BY a)
        |SELECT asset_id, modality, width, height, sum_r, sum_g, sum_b,
        |       CAST(NULL AS INTEGER) AS sample_rate, CAST(NULL AS BIGINT) AS n_samples,
        |       CAST(NULL AS BIGINT) AS sum_amp, CAST(NULL AS INTEGER) AS peak
        |FROM img
        |UNION ALL
        |SELECT asset_id, modality, CAST(NULL AS INTEGER) AS width, CAST(NULL AS INTEGER) AS height,
        |       CAST(NULL AS BIGINT) AS sum_r, CAST(NULL AS BIGINT) AS sum_g, CAST(NULL AS BIGINT) AS sum_b,
        |       sample_rate, n_samples, sum_amp, peak
        |FROM aud
        |ORDER BY asset_id""".stripMargin) { s =>
      Multimodal.decodeBinaryAssets(
        s.table("documents").select(col("doc_id").as("asset_id")))
        .orderBy("asset_id")
    }
  )
}
