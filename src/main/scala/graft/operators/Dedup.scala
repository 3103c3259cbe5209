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

  /** Universal-hash prime for MinHash mixing (2^31 − 1). */
  val MinhashP = 2147483647L

  /** Add a MinHash signature column: ONE md5 per shingle, then
    * `numHashes` independent values from a universal hash family
    * h_i(x) = ((x mod P)·(2i+1) + 409·i + 7) mod P — 12× cheaper than
    * hashing per (seed, shingle) and still engine-portable (exact int64
    * arithmetic, no overflow: (2^31)·(2k+1) stays far below 2^63).
    * Null-safe: docs with fewer than `shingleLen` words get an empty
    * signature and never produce candidates.
    *
    * STAGED projections: a single nested expression would inline the
    * shingle/md5 sub-trees into every hash lambda (Catalyst expressions
    * are trees, not DAGs) and evaluate md5 `numHashes` times per
    * shingle; separate projections evaluate each stage once per row
    * (CollapseProject keeps non-cheap expressions un-merged).
    */
  def withMinhashSignature(
      df: DataFrame, textCol: String, outCol: String,
      numHashes: Int, shingleLen: Int): DataFrame = {
    val toks = "__mh_toks"
    val bases = "__mh_bases"
    df
      .withColumn(toks, TextFunctions.tokens(col(textCol)))
      .withColumn(bases,
        when(size(col(toks)) >= shingleLen,
          transform(
            transform(sequence(lit(1), size(col(toks)) - (shingleLen - 1)),
              j => concat_ws(" ", slice(col(toks), j, lit(shingleLen)))),
            s => HashFunctions.md5Long(s) % MinhashP))
          .otherwise(array().cast(ArrayType(LongType))))
      .withColumn(outCol,
        when(size(col(bases)) > 0,
          transform(sequence(lit(0), lit(numHashes - 1)),
            i => array_min(transform(col(bases),
              h => (h * (i * 2 + 1) + i * 409 + 7) % MinhashP))))
          .otherwise(array().cast(ArrayType(LongType))))
      .drop(toks, bases)
  }

  /** LSH candidate pairs: split the signature into `bands`, bucket-join on
    * (band index, band content). Returns distinct (id_a, id_b), id_a<id_b.
    */
  def minhashCandidatePairs(
      df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 12, bands: Int = 2, shingleLen: Int = 3,
      maxBucket: Int = 64): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val sig0 = withMinhashSignature(
      df.select(col(idCol).as("__id"), col(textCol)),
      textCol, "__sig", numHashes, shingleLen)
      .select(col("__id"), col("__sig"))
    // Optimizer barrier: CollapseProject would inline the signature
    // expression into every downstream operator (filter, generate), and
    // nested-lambda inlining re-evaluates the md5 stage once per hash
    // index — observed 12× slowdown. localCheckpoint (lazy) pins
    // "compute the signature exactly once per row" into the physical
    // plan as a LogicalRDD of INTERNAL rows — the old `.rdd` round-trip
    // paid a full decode to external Rows (boxed arrays) plus a
    // re-encode per row (guide §1.4's rdd-conversion tax), and broke
    // column pruning the same way. Materializes only (id, 12×long) per
    // row, far smaller than the corpus.
    val sig = sig0.localCheckpoint(false)
      .where(size(col("__sig")) > 0)
    // band key = joined hash slice; explode → shuffle on (band, key).
    val banded = sig.select(col("__id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => concat_ws(",", slice(col("__sig"), b * rows + 1, lit(rows))))))
      .toDF("__id", "band", "key")
    // Pair generation by bucket grouping (single scan — a self-join would
    // recompute the whole signature pipeline for each side): collect the
    // ids per (band, key), emit in-bucket combinations. Buckets larger
    // than `maxBucket` are degenerate for dedup (a band shared by hundreds
    // of documents is noise, and O(n²) pairs under any formulation) and
    // are dropped — the standard LSH skew guard.
    val buckets = banded.groupBy("band", "key")
      .agg(array_sort(collect_set(col("__id"))).as("ids"))
      .where(size(col("ids")) > 1 && size(col("ids")) <= maxBucket)
    buckets
      .select(explode(flatten(transform(col("ids"), (x, i) =>
        transform(slice(col("ids"), i + 2, size(col("ids"))),
          y => struct(x.as("id_a"), y.as("id_b")))))).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .distinct()
  }

  /** Exact word-n-gram Jaccard similarity for every candidate pair:
    * explode distinct shingles, count intersections with a shuffle join,
    * |A∪B| = |A|+|B|−|A∩B|. Used to verify LSH candidates.
    */
  def jaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      candidates: DataFrame, shingleLen: Int = 3): DataFrame = {
    // Only candidate members need shingling — semi-join BEFORE the
    // (expensive) n-gram explode. At scale candidates ≪ corpus, so this
    // turns a full-corpus explode ×3 consumers into a tiny one.
    val candIds = candidates.select(col("id_a").as("__cid"))
      .union(candidates.select(col("id_b").as("__cid"))).distinct()
    val sub = df.join(candIds, col(idCol) === col("__cid"), "left_semi")
    // Three consumers below (sizes, ga, gb) would each re-run the
    // corpus scan + semi-join + n-gram explode; checkpoint (lazy,
    // internal rows) computes the shingle table once. Its size is
    // O(candidate-member docs × doc length) — candidates ≪ corpus by
    // construction, and MEMORY_AND_DISK spills rather than OOMs.
    val grams = sub.select(col(idCol).as("__id"),
      explode(array_distinct(
        TextFunctions.wordNgrams(col(textCol), shingleLen))).as("g"))
      .localCheckpoint(false)
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
