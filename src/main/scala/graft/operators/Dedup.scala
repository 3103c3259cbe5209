package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{HashFunctions, TextFunctions}

/** Deduplication operators for training-data pipelines — exact, MinHash+LSH,
  * SimHash, and n-gram Jaccard. Everything is expressed relationally
  * (explode → shuffle on content keys → aggregate), so each stage scales
  * horizontally: no driver-side state, no per-executor global structures.
  *
  * At 100 TB the candidate-pair stage is the bottleneck; LSH banding keeps
  * it at O(duplicates) instead of O(n²) — only rows sharing a band bucket
  * ever meet in the join.
  */
object Dedup {

  /** Keep exactly one row per key set, chosen by a deterministic order —
    * the relational form of "first write wins" dedup
    * (reference: src/stream/src/executor/dedup/append_only_dedup.rs:27).
    */
  def keepFirst(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /** Exact content dedup: one canonical row (smallest id) per normalized
    * text fingerprint. Single shuffle on the 128-bit fingerprint.
    */
  def exactByContent(df: DataFrame, idCol: String, textCol: String): DataFrame =
    keepFirst(
      df.withColumn("__fp", TextFunctions.fingerprint(col(textCol))),
      Seq("__fp"), Seq(col(idCol))).drop("__fp")

  /** Groups of exact duplicates (fingerprint, member ids, count). */
  def exactDupGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), TextFunctions.fingerprint(col(textCol)).as("fp"))
      .groupBy("fp")
      .agg(count(lit(1)).as("n"), array_sort(collect_list(col(idCol))).as("ids"))
      .where(col("n") > 1)

  /** MinHash signature column: for each of `numHashes` seeded hash
    * functions, the min hash over the document's word `shingleLen`-grams.
    * Null-safe: docs with fewer than `shingleLen` words get an empty
    * signature and never produce candidates.
    */
  def minhashSignature(text: Column, numHashes: Int, shingleLen: Int): Column = {
    val shingles = TextFunctions.wordNgrams(text, shingleLen)
    when(size(shingles) > 0,
      transform(sequence(lit(0), lit(numHashes - 1)),
        i => array_min(transform(shingles,
          s => HashFunctions.md5LongSeeded(s, i)))))
      .otherwise(array().cast(ArrayType(LongType)))
  }

  /** LSH candidate pairs: split the signature into `bands`, bucket-join on
    * (band index, band content). Returns distinct (id_a, id_b), id_a<id_b.
    */
  def minhashCandidatePairs(
      df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 12, bands: Int = 4, shingleLen: Int = 3): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val sig = df.select(col(idCol).as("__id"),
      minhashSignature(col(textCol), numHashes, shingleLen).as("__sig"))
      .where(size(col("__sig")) > 0)
    // band key = joined hash slice; explode → shuffle on (band, key)
    val banded = sig.select(col("__id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => concat_ws(",", slice(col("__sig"), b * rows + 1, lit(rows))))))
      .toDF("__id", "band", "key")
    val a = banded.select(col("band"), col("key"), col("__id").as("id_a"))
    val b = banded.select(col("band"), col("key"), col("__id").as("id_b"))
    a.join(b, Seq("band", "key"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
  }

  /** Exact word-n-gram Jaccard similarity for every candidate pair:
    * explode distinct shingles, count intersections with a shuffle join,
    * |A∪B| = |A|+|B|−|A∩B|. Used to verify LSH candidates.
    */
  def jaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      candidates: DataFrame, shingleLen: Int = 3): DataFrame = {
    val grams = df.select(col(idCol).as("__id"),
      explode(array_distinct(
        TextFunctions.wordNgrams(col(textCol), shingleLen))).as("g"))
    val sizes = grams.groupBy("__id").agg(count(lit(1)).as("sz"))
    val ga = grams.select(col("__id").as("id_a"), col("g"))
    val gb = grams.select(col("__id").as("id_b"), col("g"))
    val interCount = candidates.join(ga, Seq("id_a")).join(gb, Seq("id_b", "g"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
    interCount
      .join(sizes.withColumnRenamed("__id", "id_a").withColumnRenamed("sz", "sza"), Seq("id_a"))
      .join(sizes.withColumnRenamed("__id", "id_b").withColumnRenamed("sz", "szb"), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (col("inter").cast(DoubleType) /
          (col("sza") + col("szb") - col("inter"))).as("jaccard"))
  }

  /** SimHash fingerprint (relational formulation): per distinct token, a
    * stable 60-bit hash; per bit b, sum of ±1 over tokens; fingerprint =
    * Σ 2^b where the sum is positive. Two aggregations, no UDF state.
    * reference behavior analog: near-dup docs differ in few bits.
    */
  def simhash(df: DataFrame, idCol: String, textCol: String, bits: Int = 16): DataFrame = {
    val tok = df
      .select(col(idCol).as("__id"),
        explode(array_distinct(TextFunctions.tokens(col(textCol)))).as("t"))
      .withColumn("h", HashFunctions.md5Long(col("t")))
      .withColumn("b", explode(sequence(lit(0), lit(bits - 1))))
      .withColumn("p", pow(lit(2.0), col("b")).cast(LongType))
      .withColumn("sign",
        when(expr("(h div p) % 2") === 1, lit(1L)).otherwise(lit(-1L)))
    tok.groupBy("__id", "b", "p").agg(sum(col("sign")).as("s"))
      .groupBy("__id")
      .agg(sum(when(col("s") > 0, col("p")).otherwise(0L)).as("simhash"))
      .withColumnRenamed("__id", idCol)
  }

  /** Hamming distance between two simhash fingerprints (≤ 60 bits). */
  def hammingDistance(a: Column, b: Column, bits: Int = 16): Column =
    (0 until bits).map { bit =>
      (shiftright(a.bitwiseXOR(b), bit) % 2).cast(IntegerType)
    }.reduce(_ + _)
}
