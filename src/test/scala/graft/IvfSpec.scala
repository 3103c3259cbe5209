package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.operators.{KMeans, SimilaritySearch}

class IvfSpec extends SparkSpecBase {
  import spark.implicits._

  test("relational k-means converges to cluster structure") {
    // two well-separated blobs in 2-D
    val pts = ((1 to 20).map(i => (i.toLong, Array(10.0f + i % 3, 10.0f))) ++
      (21 to 40).map(i => (i.toLong, Array(-10.0f - i % 3, -10.0f))))
      .toDF("vec_id", "embedding")
    val centroids = KMeans.fit(pts, "vec_id", "embedding", k = 2, iterations = 4)
      .collect().map(r => r.getSeq[Double](1))
    assert(centroids.length == 2)
    val xs = centroids.map(_.head).sorted
    assert(xs(0) < -9.0 && xs(1) > 9.0, s"centroids: ${centroids.toSeq}")
  }

  test("IVF top-k recall vs brute force on the embeddings fixture") {
    val e = Tables.df(spark, "/root/testdata/sf0.01", "embeddings")
    val qs = e.where(col("vec_id") < 10)
      .select(col("vec_id").as("q"), col("embedding").as("qv"))
    val bf = SimilaritySearch.bruteForceTopK(e, "vec_id", "embedding",
      qs, "q", "qv", k = 5)
      .select("qid", "id").as[(Long, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val ivf = SimilaritySearch.ivfTopK(e, "vec_id", "embedding",
      qs, "q", "qv", k = 5, nCells = 4, nprobe = 3)
      .select("qid", "id").as[(Long, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    assert(ivf.keySet == bf.keySet)
    // UNCLUSTERED random vectors are IVF's worst case: expected recall ≈
    // fraction of corpus probed (~3/4 here, minus cell-size skew). Real
    // embedding corpora cluster and recall approaches 1; this bound just
    // pins the mechanism.
    val recall = bf.keys.toSeq.map(q =>
      (ivf(q) intersect bf(q)).size.toDouble / bf(q).size).sum / bf.size
    assert(recall >= 0.4, s"recall=$recall")
  }

  test("autoCells sizes cells ~sqrt(n); clustered corpus keeps recall at small nprobe") {
    assert(SimilaritySearch.autoCells(100) == 10)
    assert(SimilaritySearch.autoCells(1) == 8)          // floor
    assert(SimilaritySearch.autoCells(1000000) == 1000) // √n
    assert(SimilaritySearch.autoCells(Long.MaxValue) == 4096) // cap
    // the regime autoCells is FOR: a corpus with real cluster structure.
    // 16 tight blobs in 8-D, 64 points each → autoCells(1024)=32 cells,
    // nprobe=2 probes ~6% of the corpus yet recall stays high because a
    // query's true neighbors share its blob (and hence its cell).
    def h(tag: String, s: Long, i: Int): Float =
      (((graft.functions.HashFunctions.md5LongLocal(s"$tag:$s:$i") &
        0xffffL).toDouble / 0xffffL) - 0.5).toFloat
    val pts = (0L until 1024L).map { s =>
      val blob = (s % 16).toInt
      (s, Array.tabulate(8)(d =>
        (if (d == blob % 8) 10f * (if (blob < 8) 1 else -1) else 0f) +
          0.3f * h("n", s, d)))
    }.toDF("vec_id", "embedding")
    val qs = pts.where(col("vec_id") < 8)
      .select(col("vec_id").as("q"), col("embedding").as("qv"))
    val bf = SimilaritySearch.bruteForceTopK(pts, "vec_id", "embedding",
      qs, "q", "qv", k = 5)
      .select("qid", "id").as[(Long, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val ivf = SimilaritySearch.ivfTopK(pts, "vec_id", "embedding",
      qs, "q", "qv", k = 5, nprobe = 2) // nCells defaulted: autoCells
      .select("qid", "id").as[(Long, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val recall = bf.keys.toSeq.map(q =>
      (ivf.getOrElse(q, Set.empty) intersect bf(q)).size.toDouble / bf(q).size)
      .sum / bf.size
    assert(recall >= 0.9, s"clustered-corpus recall=$recall at nprobe=2")
  }

  test("quantize/dequantize bounds the reconstruction error") {
    val df = Seq((1L, Array(0.5f, -0.25f, 0.125f))).toDF("id", "v")
    val scale = 1.0 / 64
    val rows = df.select(
      VectorFunctions.dequantize(
        VectorFunctions.quantize(col("v"), scale), scale).as("r"),
      VectorFunctions.toDoubleVec(col("v")).as("o"))
      .head()
    val (r, o) = (rows.getSeq[Double](0), rows.getSeq[Double](1))
    r.zip(o).foreach { case (a, b) => assert(math.abs(a - b) <= scale / 2 + 1e-12) }
  }

  test("normalize produces unit vectors") {
    val df = Seq((1L, Array(3.0f, 4.0f))).toDF("id", "v")
    val n = df.select(VectorFunctions.l2Norm(
      VectorFunctions.normalize(col("v"))).as("n")).head().getDouble(0)
    assert(math.abs(n - 1.0) < 1e-12)
  }
}
