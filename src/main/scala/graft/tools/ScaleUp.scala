package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale the driver's TPC-H-ish testdata by an integer factor, preserving
  * foreign-key structure, for large-SF bench passes (the driver only ships
  * sf0.001/0.01/0.1).
  *
  * Each fact/dim table is replicated `factor` times; copy `i` offsets every
  * key column by `i * (max key + 1)` so keys stay dense and disjoint, and
  * FK columns co-rotate with their parent (copy i of lineitem references
  * copy i of orders/part/supplier) so join fan-outs and selectivities match
  * the original distribution — the same shape TPC-H dbgen produces at a
  * higher SF. Tiny dims (region, nation) are kept as-is, like TPC-H.
  *
  * Text/embedding tables get a per-copy perturbation (a copy-suffix token on
  * `text`, hash-noise on `embedding`) so dedup/ANN queries see the same
  * WITHIN-copy duplicate structure instead of every row having factor-1
  * exact clones across copies.
  *
  * Usage: ScaleUp <srcDir> <destDir> [factor=10]
  */
object ScaleUp {

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dest = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def load(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")

    /** `max(key) + 1` of a table column — a PARENT table's key-domain
      * stride. FK columns must offset by their parent's stride, not
      * their own max: a child whose top parent key is unreferenced
      * would otherwise co-rotate short and give copies ≥ 1 dangling or
      * cross-copy FKs, silently skewing scaled join selectivity.
      */
    def domainStride(name: String, key: String): Long =
      load(name).agg(max(col(key))).head().getAs[Any](0) match {
        case l: Long => l + 1L
        case i: Int  => i.toLong + 1L
      }

    /** Cross-join with copy ids 0..factor-1 and offset each key by
      * copy * stride. PKs stride by their own domain; FKs MUST pass the
      * parent's stride via `strides`; fixed overrides serve tables whose
      * bench queries reserve id ranges above the base ids (documents —
      * see the plant-range note at the documents write below).
      */
    def replicate(df: DataFrame, keys: Seq[String],
        strides: Map[String, Long] = Map.empty): DataFrame = {
      val maxes = keys.map { k =>
        k -> strides.getOrElse(k,
          df.agg(max(col(k))).head().getAs[Any](0) match {
            case l: Long => l + 1L
            case i: Int  => i.toLong + 1L
          })
      }.toMap
      val copies = spark.range(factor).withColumnRenamed("id", "__copy")
      keys.foldLeft(df.crossJoin(broadcast(copies))) { (acc, k) =>
        acc.withColumn(k, (col(k) + col("__copy") * lit(maxes(k))).cast(df.schema(k).dataType))
      }
    }

    def write(df: DataFrame, name: String): Unit = {
      df.drop("__copy").write.mode("overwrite").parquet(s"$dest/$name.parquet")
      println(s"[scaleup] $name done")
    }

    // Tiny dims: copy through unchanged.
    Seq("region", "nation").foreach(n => write(load(n), n))

    // FK strides come from the PARENT key domain so every copy's FKs land
    // exactly on that copy's parent keys (dbgen-like density), regardless
    // of whether the top parent key happens to be referenced.
    val custStride = domainStride("customer", "c_custkey")
    val suppStride = domainStride("supplier", "s_suppkey")
    val partStride = domainStride("part", "p_partkey")
    val orderStride = domainStride("orders", "o_orderkey")

    write(replicate(load("customer"), Seq("c_custkey")), "customer")
    write(replicate(load("supplier"), Seq("s_suppkey")), "supplier")
    write(replicate(load("part"), Seq("p_partkey")), "part")
    write(replicate(load("orders"), Seq("o_orderkey", "o_custkey"),
      Map("o_custkey" -> custStride)), "orders")
    write(replicate(load("lineitem"),
      Seq("l_orderkey", "l_partkey", "l_suppkey"),
      Map("l_orderkey" -> orderStride, "l_partkey" -> partStride,
        "l_suppkey" -> suppStride)), "lineitem")
    // events.user_id is its own id domain (0..n_users-1, not customer keys)
    write(replicate(load("events"), Seq("event_id", "user_id")), "events")

    // documents: offset doc_id; suffix a copy token so cross-copy rows are
    // not exact/near duplicates of each other (within-copy dup structure is
    // what dedup queries should measure). The dedup oracles plant dups at
    // doc_id + 1e8 (near) / + 2e8 (exact), so every copy must stay under
    // 1e8: factor ≤ 10 keeps the historical 10M stride (the cached sf1
    // corpus layout); larger factors stride by the actual doc_id domain,
    // and the cap becomes factor × stride < 1e8.
    val docStride =
      if (factor <= 10) 10000000L else domainStride("documents", "doc_id")
    // last copy spans [(factor-1)*stride, (factor-1)*stride + stride), so
    // the exclusive upper bound is factor*stride — which may EQUAL 1e8
    // (factor=10 × the historical 10M stride lands exactly on it)
    require(factor * docStride <= 100000000L,
      s"factor $factor x stride $docStride would push documents copies " +
        "into the planted-dup id ranges (+1e8/+2e8)")
    write(
      replicate(load("documents"), Seq("doc_id"),
        Map("doc_id" -> docStride))
        .withColumn("text",
          when(col("__copy") === 0, col("text"))
            .otherwise(concat(col("text"), lit(" c"), col("__copy"))))
        .withColumn("n_chars", length(col("text")).cast("long")),
      "documents")

    // embeddings: offset vec_id; add deterministic per-(row, copy, dim)
    // noise so copies don't collapse into identical LSH buckets / tied
    // neighbor lists.
    write(
      replicate(load("embeddings"), Seq("vec_id"))
        .withColumn("embedding",
          when(col("__copy") === 0, col("embedding")).otherwise(
            zip_with(
              col("embedding"),
              transform(sequence(lit(0), size(col("embedding")) - 1),
                i => sin(col("vec_id") * 31 + col("__copy") * 17 + i) * lit(0.01f)),
              (v, n) => (v + n).cast("float")))),
      "embeddings")

    spark.stop()
  }
}
