package graft

import graft.operators.{Multimodal, SimilaritySearch}
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpecBase {
  import spark.implicits._

  private def vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(0.0f, 0.0f, 1.0f)),
    (4L, Array(-1.0f, 0.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("bruteForceTopK ranks by cosine") {
    val qs = vecs.where(col("vec_id") === 0)
      .select(col("vec_id").as("qid0"), col("embedding").as("qv"))
    val top = SimilaritySearch.bruteForceTopK(vecs, "vec_id", "embedding",
      qs, "qid0", "qv", k = 2)
      .orderBy("rank").select("id").as[Long].collect().toSeq
    assert(top == Seq(1L, 2L)) // 1 is closest (cos≈0.994), then orthogonal (0), tie→id
  }

  test("lshTopK scores same-bucket pairs identically to brute force") {
    val qs = vecs.select(col("vec_id").as("qid0"), col("embedding").as("qv"))
    val bf = SimilaritySearch.bruteForceTopK(vecs, "vec_id", "embedding",
      qs, "qid0", "qv", k = 4)
      .select("qid", "id", "cos").as[(Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    val lsh = SimilaritySearch.lshTopK(vecs, "vec_id", "embedding",
      qs, "qid0", "qv", k = 4, nBits = 2, dims = 3)
      .select("qid", "id", "cos").as[(Long, Long, Double)].collect()
    assert(lsh.nonEmpty)
    lsh.foreach { case (q, i, c) => assert(bf((q, i)) == c) }
  }

  test("nearDupPairs finds the nearly-identical pair") {
    val pairs = SimilaritySearch.nearDupPairs(vecs, "vec_id", "embedding",
      threshold = 0.9, nBits = 1, dims = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("multimodal generic digest path: deterministic features, streamed batches") {
    val assets = Multimodal.demoAssets(spark, "/root/testdata/sf0.001")
    val f1 = Multimodal.decodeFeatures(assets).orderBy("asset_id")
      .select("asset_id", "feature").as[(Long, Seq[Float])].collect()
    val f2 = Multimodal.decodeFeatures(assets).orderBy("asset_id")
      .select("asset_id", "feature").as[(Long, Seq[Float])].collect()
    assert(f1.toSeq == f2.toSeq)
    assert(f1.forall(_._2.length == 8))
    val frames = Multimodal.sampleFrames(assets, 3)
    val perAsset = frames.groupBy("asset_id").count()
      .select("count").as[Long].collect()
    assert(perAsset.nonEmpty && perAsset.forall(_ == 3))
  }
}
