package graft

import org.apache.spark.sql.functions._

import graft.operators.SimilaritySearch
import graft.streaming.MvCatalog

/** Continuously-maintained ANN index: embeddings stream into an MV of
  * (id, vec, norm, bucket) storage-bucketed on the LSH bucket; probes
  * against the materialized index must match the batch LSH operator and
  * read only the touched storage buckets.
  */
class StreamingAnnSpec extends SparkSpecBase {
  import spark.implicits._

  test("streamed index probe matches the batch LSH top-k") {
    val sfDir = "/root/testdata/sf0.001"
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val dir = tmpDir("sann")
    emb.repartition(4).write.parquet(s"$dir/in")

    val cat = new MvCatalog(spark, dir)
    val mv = cat.define("ann_index", Seq("id"), nBuckets = 4,
      bucketKeys = Seq("bucket"))
    val stream = SimilaritySearch.indexRows(
      spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$dir/in"),
      "vec_id", "embedding")
    val q = mv.start(stream, cat.checkpointDir("ann_index"))
    q.processAllAvailable()
    q.stop()

    val queries = emb.where(col("vec_id") < 8)
      .select(col("vec_id").as("qvec_id"), col("embedding").as("qembedding"))
    val got = SimilaritySearch.probeIndex(
      mv.read(), queries, "qvec_id", "qembedding", k = 2)
      .select("qid", "id", "cos", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    val want = SimilaritySearch.lshTopK(
      emb, "vec_id", "embedding", queries, "qvec_id", "qembedding", k = 2)
      .select("qid", "id", "cos", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(got == want && got.nonEmpty)
  }

  test("probe reads only the touched storage buckets (partition-pruned)") {
    val sfDir = "/root/testdata/sf0.001"
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val dir = tmpDir("sann-prune")
    val cat = new MvCatalog(spark, dir)
    val mv = cat.define("ann_idx2", Seq("id"), nBuckets = 4,
      bucketKeys = Seq("bucket"))
    mv.merge(SimilaritySearch.indexRows(emb, "vec_id", "embedding"))

    val one = emb.where(col("vec_id") === 3)
      .select(col("vec_id").as("qvec_id"), col("embedding").as("qembedding"))
    val touched = mv.readTouched(
      SimilaritySearch.indexRows(one, "qvec_id", "qembedding").select("bucket"))
    // pruned read produces the same probe answer as the full read…
    val got = SimilaritySearch.probeIndex(
      touched, one, "qvec_id", "qembedding", k = 2)
      .select("qid", "id").as[(Long, Long)].collect().toSet
    val want = SimilaritySearch.probeIndex(
      mv.read(), one, "qvec_id", "qembedding", k = 2)
      .select("qid", "id").as[(Long, Long)].collect().toSet
    assert(got == want && got.nonEmpty)
    // …and its scan is partition-filtered on the storage bucket column
    val scan = touched.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("__bucket"),
      s"probe not partition-pruned:\n$scan")
  }
}
