package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.operators.SimilaritySearch

/** Similarity search over `embeddings` (array<float>, 64-dim) — exact
  * brute-force top-k, LSH-bucketed ANN, and threshold near-dup pairs
  * (BASELINE.json north-star ops). Oracle replicates the double-promoted
  * sequential-fold vector math with DuckDB list lambdas.
  */
object LlmSimilarity extends QueryPack {

  /** DuckDB dot product: index-driven, promoted to double, sequential sum
    * (bit-matches VectorFunctions.dot's left fold).
    */
  private def dotSqlN(a: String, b: String, n: Int) =
    s"""list_sum(list_transform(range(1, ${n + 1}),
       |  i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))""".stripMargin

  private def dotSql(a: String, b: String) = dotSqlN(a, b, 64)

  private def normSql(a: String) = s"sqrt(${dotSql(a, a)})"

  private def cosSqlN(a: String, b: String, n: Int) = {
    def nrm(v: String) = s"sqrt(${dotSqlN(v, v, n)})"
    s"""(CASE WHEN ${nrm(a)} * ${nrm(b)} > 0.0
       |  THEN ${dotSqlN(a, b, n)} / (${nrm(a)} * ${nrm(b)})
       |  ELSE 0.0 END)""".stripMargin
  }

  private def cosSql(a: String, b: String) =
    s"""(CASE WHEN ${normSql(a)} * ${normSql(b)} > 0.0
       |  THEN ${dotSql(a, b)} / (${normSql(a)} * ${normSql(b)})
       |  ELSE 0.0 END)""".stripMargin

  /** DuckDB hyperplane-LSH bucket (VectorFunctions.lshBucket, 4 bits). */
  private def bucketSql(v: String) =
    (0 until 4).map { b =>
      s"""(CASE WHEN list_sum(list_transform(range(1, 65),
         |  i -> CASE WHEN CAST(('0x' || substr(md5('$b:' || (i-1)::VARCHAR),1,15)) AS BIGINT) % 2 = 0
         |       THEN CAST($v[i] AS DOUBLE) ELSE -CAST($v[i] AS DOUBLE) END)) > 0.0
         |  THEN ${1 << b} ELSE 0 END)""".stripMargin
    }.mkString("(", " + ", ")")

  /** DuckDB replica of the ADAPTIVE banded bucket
    * (SimilaritySearch.bandedNearDupPairs): band `k` draws hyperplanes
    * from seed block k·64, the bit width is round(log2(n/64)) floored at
    * 4 — the same formula as SimilaritySearch.autoBits, computed by a
    * scalar subquery so the oracle follows the corpus size.
    */
  private def bucketDynSql(v: String, band: Int) =
    // `||` stays at line ENDS: this fragment nests inside two more
    // stripMargin strings, each of which would eat a leading pipe
    s"""list_sum(list_transform(
       |  range(0, (SELECT GREATEST(4, CAST(round(log2(count(*) / 64.0)) AS INT))
       |            FROM embeddings)),
       |  b -> CASE WHEN list_sum(list_transform(range(1, 65),
       |    i -> CASE WHEN CAST(('0x' || substr(md5(CAST(b + ${band * 64} AS VARCHAR) ||
       |                 ':' || (i-1)::VARCHAR),1,15)) AS BIGINT) % 2 = 0
       |         THEN CAST($v[i] AS DOUBLE) ELSE -CAST($v[i] AS DOUBLE) END)) > 0.0
       |    THEN CAST(pow(2, b) AS BIGINT) ELSE 0 END))""".stripMargin

  /** Banded candidate-pair CTE body over `embeddings` (2 bands). */
  private val bandedCandSql =
    s"""bset AS MATERIALIZED (SELECT vec_id, embedding,
       |    ${bucketDynSql("embedding", 0)} AS b0,
       |    ${bucketDynSql("embedding", 1)} AS b1
       |  FROM embeddings),
       |cand AS MATERIALIZED (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
       |  FROM bset a JOIN bset b ON a.b0 = b.b0 AND a.vec_id < b.vec_id
       |  UNION
       |  SELECT a.vec_id, b.vec_id
       |  FROM bset a JOIN bset b ON a.b1 = b.b1 AND a.vec_id < b.vec_id),
       |scored AS (
       |  SELECT c.id_a, c.id_b,
       |    round(${cosSql("ea.embedding", "eb.embedding")}, 6) AS cos
       |  FROM cand c
       |  JOIN embeddings ea ON ea.vec_id = c.id_a
       |  JOIN embeddings eb ON eb.vec_id = c.id_b)""".stripMargin

  val queries: Seq[GraftQuery] = Seq(
    // Norms — sanity anchor for all downstream vector math.
    q("q_embed_norm",
      s"""SELECT vec_id, CAST(label AS INT) AS label,
         |  round(${normSql("embedding")}, 6) AS nrm
         |FROM embeddings WHERE vec_id < 100 ORDER BY vec_id""".stripMargin) { s =>
      s.table("embeddings").where(col("vec_id") < 100)
        .select(col("vec_id"), col("label").cast("int").as("label"),
          round(VectorFunctions.l2Norm(col("embedding")), 6).as("nrm"))
        .orderBy("vec_id")
    },

    // Exact brute-force cosine top-3 for 5 query vectors.
    q("q_embed_topk",
      s"""SELECT qid, id, cos, CAST(rank AS BIGINT) AS rank FROM (
         |  SELECT q.vec_id AS qid, e.vec_id AS id,
         |    round(${cosSql("q.embedding", "e.embedding")}, 6) AS cos,
         |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |      ORDER BY round(${cosSql("q.embedding", "e.embedding")}, 6) DESC,
         |               e.vec_id) AS rank
         |  FROM embeddings e
         |  CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < 5) q
         |  WHERE e.vec_id <> q.vec_id
         |) WHERE rank <= 3 ORDER BY qid, rank""".stripMargin) { s =>
      val e = s.table("embeddings")
      val qs = e.where(col("vec_id") < 5)
        .select(col("vec_id").as("qvec_id"), col("embedding").as("qembedding"))
      SimilaritySearch.bruteForceTopK(e, "vec_id", "embedding",
        qs, "qvec_id", "qembedding", k = 3)
        .select(col("qid"), col("id"), col("cos"), col("rank").cast("bigint").as("rank"))
        .orderBy("qid", "rank")
    },

    // LSH bucket assignment (the ANN partitioning primitive).
    q("q_embed_lsh_bucket",
      s"""SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(MIN(vec_id) AS BIGINT) AS min_id
         |FROM (SELECT vec_id, ${bucketSql("embedding")} AS bucket FROM embeddings)
         |GROUP BY bucket ORDER BY bucket""".stripMargin) { s =>
      s.table("embeddings")
        .select(col("vec_id"),
          VectorFunctions.lshBucket(col("embedding"), 4).as("bucket"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"), min(col("vec_id")).as("min_id"))
        .orderBy("bucket")
    },

    // LSH-bucketed approximate top-2: same ranking as q_embed_topk but
    // only same-bucket pairs are scored (the 100 TB-scale path).
    q("q_embed_lsh_topk",
      s"""SELECT qid, id, cos, CAST(rank AS BIGINT) AS rank FROM (
         |  SELECT q.vec_id AS qid, e.vec_id AS id,
         |    round(${cosSql("q.embedding", "e.embedding")}, 6) AS cos,
         |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |      ORDER BY round(${cosSql("q.embedding", "e.embedding")}, 6) DESC,
         |               e.vec_id) AS rank
         |  FROM (SELECT *, ${bucketSql("embedding")} AS bucket FROM embeddings) e
         |  JOIN (SELECT *, ${bucketSql("embedding")} AS bucket FROM embeddings
         |        WHERE vec_id < 8) q
         |    ON e.bucket = q.bucket AND e.vec_id <> q.vec_id
         |) WHERE rank <= 2 ORDER BY qid, rank""".stripMargin) { s =>
      val e = s.table("embeddings")
      val qs = e.where(col("vec_id") < 8)
        .select(col("vec_id").as("qvec_id"), col("embedding").as("qembedding"))
      SimilaritySearch.lshTopK(e, "vec_id", "embedding",
        qs, "qvec_id", "qembedding", k = 2, nBits = 4)
        .select(col("qid"), col("id"), col("cos"), col("rank").cast("bigint").as("rank"))
        .orderBy("qid", "rank")
    },

    // IVF (k-means cells + nprobe) approximate top-k. Which neighbors it
    // returns is engine-specific (float-mean centroids are merge-order
    // dependent), so the hashed surface is the DETERMINISTIC contract:
    // each query gets exactly k results, every returned score is the
    // true cosine of that pair (recomputed independently from the
    // embeddings and matched to 1e-9), and aggregate recall against
    // brute force clears a loose stable floor (fine-grained recall is
    // pinned in IvfSpec). The oracle asserts the same constants.
    q("q_embed_ivf_topk",
      """SELECT vec_id AS qid, CAST(3 AS BIGINT) AS k_returned,
        |  true AS cos_exact_ok, true AS recall_ok
        |FROM embeddings WHERE vec_id < 5 ORDER BY qid""".stripMargin) { s =>
      import graft.operators.SimilaritySearch
      import graft.functions.VectorFunctions
      val e = s.table("embeddings")
      val qs = e.where(col("vec_id") < 5)
        .select(col("vec_id").as("qvec_id"), col("embedding").as("qembedding"))
      val ivf = SimilaritySearch.ivfTopK(e, "vec_id", "embedding",
        qs, "qvec_id", "qembedding", k = 3, nCells = 8, nprobe = 3)
      val bf = SimilaritySearch.bruteForceTopK(e, "vec_id", "embedding",
        qs, "qvec_id", "qembedding", k = 3)
      // recall floor: ≥3 of the 15 brute-force neighbors found. nprobe
      // 3/8 cells ⇒ expected hits ≈ 6+ even on an unclustered corpus;
      // the floor is far below any plausible run-to-run wobble.
      val hits = ivf.join(bf.select("qid", "id"), Seq("qid", "id"), "left_semi")
        .agg(count(lit(1)).as("hits"))
      // score integrity: every returned cos must equal the independently
      // recomputed exact cosine of (query, id). ivfTopK rounds its
      // output to 6 decimals, so the bound is the rounding radius.
      val checked = ivf
        .join(e.select(col("vec_id").as("id"), col("embedding").as("dvec")), "id")
        .join(qs.select(col("qvec_id").as("qid"), col("qembedding").as("qvec")), "qid")
        .withColumn("cos2", VectorFunctions.cosine(col("qvec"), col("dvec")))
      checked.groupBy("qid")
        .agg(count(lit(1)).as("k_returned"),
          min(abs(col("cos") - col("cos2")) < 1e-6).as("cos_exact_ok"))
        .crossJoin(hits)
        .select(col("qid"), col("k_returned"), col("cos_exact_ok"),
          (col("hits") >= 3).as("recall_ok"))
        .orderBy("qid")
    },

    // Embedding near-dup pairs above a cosine threshold, pruned by
    // ADAPTIVE banded LSH (bit width follows the corpus so buckets stay
    // ~64 rows — candidate pairs linear in n at every SF; two bands buy
    // the recall back).
    q("q_embed_neardup",
      s"""WITH $bandedCandSql
         |SELECT id_a, id_b, cos FROM scored
         |WHERE cos >= 0.3 ORDER BY id_a, id_b""".stripMargin) { s =>
      SimilaritySearch.bandedNearDupPairs(s.table("embeddings"), "vec_id",
        "embedding", threshold = 0.3)
        .orderBy("id_a", "id_b")
    },

    // SemDeDup (Abbas et al., arXiv:2303.09540): SEMANTIC dedup over
    // embeddings — inside each LSH cell, an item with a smaller-id
    // neighbor above the cosine threshold is dropped; survivors are the
    // kept corpus. Keep-lowest-id is the paper's one-per-group pick made
    // deterministic; the LSH cell stands in for the paper's k-means
    // cluster (plan-time hyperplanes, zero training passes — at 100 TB
    // the identical shape runs over ivfTopK's trained cells instead).
    // One bucketed self-join (never all-pairs) + one anti-join.
    q("q_dedup_semantic",
      s"""WITH $bandedCandSql
         |SELECT vec_id, CAST(label AS INT) AS label FROM embeddings
         |WHERE vec_id NOT IN (SELECT id_b FROM scored WHERE cos >= 0.5)
         |ORDER BY vec_id""".stripMargin) { s =>
      val e = s.table("embeddings")
      val dropped = SimilaritySearch.bandedNearDupPairs(e, "vec_id",
        "embedding", threshold = 0.5)
        .select(col("id_b").as("vec_id")).distinct()
      e.join(dropped, Seq("vec_id"), "left_anti")
        .select(col("vec_id"), col("label").cast("int").as("label"))
        .orderBy("vec_id")
    },

    // Matryoshka truncation: rank candidates by the 16-dim prefix
    // cosine (the cheap first pass a tiered retrieval system runs) and
    // carry the full 64-dim cosine alongside — the re-rank signal. The
    // rank key is the ROUNDED prefix cosine on both sides, tie-broken
    // by id; prefix vectors never materialize (slice stays in the
    // projection, so the broadcast ships only the 5 query rows).
    q("q_embed_matryoshka",
      s"""SELECT qid, id, rank, cos16, cos64 FROM (
         |  SELECT q.vec_id AS qid, e.vec_id AS id,
         |    round(${cosSqlN("q.embedding", "e.embedding", 16)}, 6) AS cos16,
         |    round(${cosSqlN("q.embedding", "e.embedding", 64)}, 6) AS cos64,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |      ORDER BY round(${cosSqlN("q.embedding", "e.embedding", 16)}, 6) DESC,
         |               e.vec_id) AS BIGINT) AS rank
         |  FROM embeddings e
         |  CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < 5) q
         |  WHERE e.vec_id <> q.vec_id
         |) WHERE rank <= 3 ORDER BY qid, rank""".stripMargin) { s =>
      import org.apache.spark.sql.expressions.Window
      val e = s.table("embeddings")
      val qs = e.where(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val c16 = VectorFunctions.cosine(
        slice(col("qvec"), 1, 16), slice(col("embedding"), 1, 16))
      val c64 = VectorFunctions.cosine(col("qvec"), col("embedding"))
      val w = Window.partitionBy("qid")
        .orderBy(col("cos16").desc, col("id"))
      e.crossJoin(broadcast(qs))
        .where(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("id"),
          round(c16, 6).as("cos16"), round(c64, 6).as("cos64"))
        .withColumn("rank", row_number().over(w).cast("bigint"))
        .where(col("rank") <= 3)
        .select(col("qid"), col("id"), col("rank"), col("cos16"), col("cos64"))
        .orderBy("qid", "rank")
    }
  )
}
