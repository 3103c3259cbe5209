package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.streaming.{MvCatalog, StreamingDedup}

/** Streaming MinHash+LSH near-dup detection: incremental candidate
  * discovery over micro-batches must converge to the batch operator's
  * answer, catch duplicates that arrive in different batches, and keep
  * per-bucket state bounded under adversarial skew.
  */
class StreamingDedupSpec extends SparkSpecBase {
  import spark.implicits._

  test("streamed corpus converges to the batch candidate-pair answer") {
    val sfDir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val dir = tmpDir("sdedup")
    // 4 files → 4 micro-batches: duplicates land in different epochs
    docs.repartition(4).write.parquet(s"$dir/in")

    val want = Dedup.minhashCandidatePairs(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    assert(want.nonEmpty, "fixture should contain near-duplicates")

    val cat = new MvCatalog(spark, dir)
    val mv = cat.define("pairs", Seq("id_a", "id_b"), nBuckets = 4)
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in")
    val q = mv.start(
      StreamingDedup.candidatePairs(stream, "doc_id", "text").toDF(),
      cat.checkpointDir("pairs"))
    q.processAllAvailable()
    q.stop()

    val got = mv.read().select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == want)
  }

  test("a near-dup arriving batches later is caught (bucket remembers)") {
    val dir = tmpDir("sdedup-late")
    val a = "the quick brown fox jumps over the lazy dog again and again"
    val b = "the quick brown fox jumps over the lazy dog again and again today"
    val unrelated = "completely different words about spark state stores here"
    Seq((1L, a), (2L, unrelated)).toDF("doc_id", "text")
      .write.parquet(s"$dir/in/b0")
    val cat = new MvCatalog(spark, dir)
    val mv = cat.define("late_pairs", Seq("id_a", "id_b"), nBuckets = 2)
    val stream = spark.readStream
      .schema(Seq((1L, a)).toDF("doc_id", "text").schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in/*")
    val q = mv.start(
      StreamingDedup.candidatePairs(stream, "doc_id", "text").toDF(),
      cat.checkpointDir("late_pairs"))
    q.processAllAvailable()
    assert(mv.read().count() == 0)

    // the twin arrives a "week" later, in its own micro-batch
    Seq((3L, b)).toDF("doc_id", "text").write.parquet(s"$dir/in/b1")
    q.processAllAvailable()
    q.stop()
    val got = mv.read().select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got.contains((1L, 3L)))
  }

  test("bucket state survives a stop/restart (checkpoint recovery)") {
    val dir = tmpDir("sdedup-recover")
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val b = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda"
    Seq((1L, a)).toDF("doc_id", "text").write.parquet(s"$dir/in/b0")
    val cat = new MvCatalog(spark, dir)
    val mv = cat.define("rec_pairs", Seq("id_a", "id_b"), nBuckets = 2)
    val schema = Seq((1L, a)).toDF("doc_id", "text").schema
    def startJob() = mv.start(
      StreamingDedup.candidatePairs(
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(s"$dir/in/*"), "doc_id", "text").toDF(),
      cat.checkpointDir("rec_pairs"))

    val q1 = startJob()
    q1.processAllAvailable()
    q1.stop() // doc 1 is in bucket state, checkpointed

    Seq((2L, b)).toDF("doc_id", "text").write.parquet(s"$dir/in/b1")
    val q2 = startJob() // fresh query, same checkpoint: state recovers
    q2.processAllAvailable()
    q2.stop()
    val got = mv.read().select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got.contains((1L, 2L)),
      "pair must be found against the RECOVERED pre-restart bucket member")
  }

  test("degenerate buckets collapse to a tombstone: bounded pairs, bounded state") {
    val dir = tmpDir("sdedup-skew")
    val boiler = "identical boilerplate text repeated across the entire corpus here"
    // 3 copies first (under cap=4) → 3 pairs; then 20 more copies blow
    // the cap → the bucket degenerates, no further pairs from it
    (0L until 3L).map(i => (i, boiler)).toDF("doc_id", "text")
      .write.parquet(s"$dir/in/b0")
    val cat = new MvCatalog(spark, dir)
    val mv = cat.define("skew_pairs", Seq("id_a", "id_b"), nBuckets = 2)
    val stream = spark.readStream
      .schema(Seq((0L, boiler)).toDF("doc_id", "text").schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in/*")
    val q = mv.start(
      StreamingDedup.candidatePairs(stream, "doc_id", "text", maxBucket = 4).toDF(),
      cat.checkpointDir("skew_pairs"))
    q.processAllAvailable()
    assert(mv.read().count() == 3) // C(3,2)

    (3L until 23L).map(i => (i, boiler)).toDF("doc_id", "text")
      .write.parquet(s"$dir/in/b1")
    q.processAllAvailable()
    q.stop()
    assert(mv.read().count() == 3) // degenerate: nothing new emitted
  }
}
