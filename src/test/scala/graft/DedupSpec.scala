package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

class DedupSpec extends SparkSpecBase {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog today"),
    (2L, "the quick brown fox jumps over the lazy dog today"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy dog tonight"), // near dup
    (4L, "completely different content about databases and streams here"),
    (5L, "short text")
  ).toDF("doc_id", "text")

  test("exactDupGroups finds exact duplicates only") {
    val groups = Dedup.exactDupGroups(corpus, "doc_id", "text").collect()
    assert(groups.length == 1)
    assert(groups.head.getSeq[Long](groups.head.fieldIndex("ids")) == Seq(1L, 2L))
  }

  test("exactByContent keeps the smallest id") {
    val kept = Dedup.exactByContent(corpus, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 3L, 4L, 5L))
  }

  test("minhash LSH finds exact and near dups, not unrelated docs") {
    val pairs = Dedup.minhashCandidatePairs(corpus, "doc_id", "text",
      numHashes = 12, bands = 6, shingleLen = 2)
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("jaccard: exact dup = 1.0, near dup high, sane bounds") {
    val cands = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    val j = Dedup.jaccardPairs(corpus, "doc_id", "text", cands, shingleLen = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(j((1L, 2L)) == 1.0)
    assert(j((1L, 3L)) > 0.5 && j((1L, 3L)) < 1.0)
  }

  test("simhash: near dups within few bits, unrelated docs far") {
    val sh = Dedup.simhash(corpus, "doc_id", "text", bits = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(1L), sh(2L)) == 0) // identical text
    assert(ham(sh(1L), sh(3L)) <= 4) // near dup
    assert(ham(sh(1L), sh(4L)) > ham(sh(1L), sh(3L))) // unrelated further
  }

  test("keepFirst is deterministic under reordering") {
    val df = Seq((1L, "x", 3.0), (1L, "y", 1.0), (2L, "z", 2.0))
      .toDF("k", "v", "o")
    val kept = Dedup.keepFirst(df, Seq("k"), Seq(col("o").asc))
      .select("v").as[String].collect().sorted
    assert(kept.toSeq == Seq("y", "z"))
  }
}
