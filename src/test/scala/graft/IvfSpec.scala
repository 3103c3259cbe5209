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
