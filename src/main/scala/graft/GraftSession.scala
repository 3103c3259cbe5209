package graft

import org.apache.spark.sql.SparkSession

/** Session bootstrap for the graft engine.
  *
  * Mirrors the session surface of the reference frontend
  * (reference: src/frontend/src/session.rs:1168 `run_statement`) at Spark
  * altitude: one `SparkSession` configured for deterministic UTC semantics
  * and a shuffle layout sized for the local[32] test harness while staying
  * valid on a large cluster (AQE coalesces / splits at runtime).
  */
object GraftSession {

  /** Apply engine defaults to a builder. Kept small: everything else is
    * Spark's own optimizer doing the work (SURVEY.md §4).
    */
  def configure(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.autoBroadcastJoinThreshold", (32L * 1024 * 1024).toString)
    .config("spark.sql.parquet.filterPushdown", "true")
    // Vector hot path: VectorFunctions emits the codegen'd
    // DotProduct/L2DistanceSq loops directly (r11), so the session-wide
    // HOF rewrite opt-in (`spark.graft.rewriteHofDot`, r10) is no longer
    // defaulted on — a user's raw aggregate(zip_with(...)) SQL keeps
    // exact Spark HOF edge semantics (NULL on ragged/null-element
    // arrays) unless they opt in themselves (ADVICE r10).
    // Driver testdata writes events.ts as TIMESTAMP(NANOS), which Spark's
    // vectorized reader rejects; read as long and convert in Tables.df.
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.parquet.aggregatePushdown", "true")
    // Changelog retention (MaterializedView.expireChangelog) deletes
    // already-committed epoch files while subscribers may be mid-listing;
    // a vanished file must degrade to "skip", not kill the stream.
    .config("spark.sql.files.ignoreMissingFiles", "true")
    .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
    // MV merge rewrites only the hash buckets a delta touches.
    .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
    .config("spark.ui.enabled", "false")

  /** Post-create initialization: native function registration etc.
    * Idempotent; call on every session produced from [[configure]].
    */
  def init(spark: SparkSession): SparkSession = {
    graft.plans.GraftExtensions.register(spark)
    // Load the parser keyword vocabulary at session boot: the first
    // `sql_keywords()` call class-initializes Spark's generated ANTLR
    // vocabulary tables (~4 s one-time, measured) — a keyword table is
    // session infrastructure (the reference parser ships its keyword
    // table in the binary), not a per-query cost, so pay it here.
    scala.util.Try(
      spark.sql("SELECT 1 FROM sql_keywords() LIMIT 1").collect())
    spark
  }

  /** Local session for tests / tools. */
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = configure(
      SparkSession.builder().master(s"local[$cores]").appName("graft")
    ).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    init(s)
  }
}
