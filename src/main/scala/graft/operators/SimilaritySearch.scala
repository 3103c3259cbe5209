package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two strategies:
  *  - [[bruteForceTopK]]: exact — broadcast the (small) query set against
  *    the corpus, score with codegen'd vector math, per-query top-k via
  *    partial TopK (no global sort). The right baseline up to ~10⁴ queries.
  *  - [[lshTopK]]: scale path — random-hyperplane LSH buckets both sides;
  *    only same-bucket pairs are scored. Probe cost drops by ~2^nBits at
  *    the cost of recall; multi-probe can be added by unioning neighbor
  *    buckets.
  */
object SimilaritySearch {

  /** Exact top-k cosine neighbors for each query row.
    * Output: (qid, id, cos, rank), rank 1..k, ties broken by id.
    */
  def bruteForceTopK(
      data: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      k: Int): DataFrame = {
    val scored = data.join(broadcast(queries))
      .where(col(qidCol) =!= col(idCol))
      .select(col(qidCol).as("qid"), col(idCol).as("id"),
        round(VectorFunctions.cosine(col(qvecCol), col(vecCol)), 6).as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** LSH-bucketed approximate top-k: queries and corpus are assigned a
    * 2^nBits bucket from deterministic hyperplane signs; scoring joins on
    * the bucket. Equi-join ⇒ single shuffle on bucket id; skewed buckets
    * are handled by AQE skew-join splitting.
    */
  def lshTopK(
      data: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      k: Int, nBits: Int = 4): DataFrame = {
    val bucketed = data.withColumn("__bucket",
      VectorFunctions.lshBucket(col(vecCol), nBits))
    val qBucketed = queries.withColumn("__bucket",
      VectorFunctions.lshBucket(col(qvecCol), nBits))
    val scored = bucketed.join(broadcast(qBucketed), Seq("__bucket"))
      .where(col(qidCol) =!= col(idCol))
      .select(col(qidCol).as("qid"), col(idCol).as("id"),
        round(VectorFunctions.cosine(col(qvecCol), col(vecCol)), 6).as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** All pairs with cosine ≥ threshold (embedding near-dup detection),
    * LSH-bucketed to avoid the O(n²) cross join.
    */
  def nearDupPairs(
      data: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nBits: Int = 4): DataFrame = {
    val bucketed = data.select(col(idCol).as("__id"), col(vecCol).as("__vec"))
      .withColumn("__bucket", VectorFunctions.lshBucket(col("__vec"), nBits))
    val a = bucketed.select(col("__bucket"), col("__id").as("id_a"), col("__vec").as("va"))
    val b = bucketed.select(col("__bucket"), col("__id").as("id_b"), col("__vec").as("vb"))
    a.join(b, Seq("__bucket"))
      .where(col("id_a") < col("id_b"))
      .withColumn("cos", round(VectorFunctions.cosine(col("va"), col("vb")), 6))
      .where(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }
}
