package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Named user-defined aggregates — the `CREATE AGGREGATE` surface
  * (reference: src/frontend/src/handler/create_aggregate.rs registers a
  * UDAF with state-transition semantics; the runtimes there are
  * python/js/wasm, which are out of scope here — `LANGUAGE native`
  * resolves against this registry of retraction-capable Aggregators
  * instead, the Spark-first rendering of the same surface).
  *
  * Every implementation takes `(value, op)` — op is the changelog sign
  * (+1 insert / −1 delete), so a created aggregate works both over plain
  * rows (`op = 1`) and over changelog replays, the property the
  * reference's streaming UDAFs must have. Registration goes through
  * `spark.udf.register`, so the name is immediately callable from any
  * SQL text the session plans.
  */
object AggregateRegistry {

  /** 64-bit value hash for the HLL path: first 8 bytes of MD5 over the
    * value's string form — deterministic across JVMs/versions (HLL
    * estimates must be stable under partial aggregation reshuffles).
    */
  private def hash64(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.nio.ByteBuffer.wrap(d).getLong
  }

  /** SQL-facing input rows. `value` arrives as STRING (Spark implicitly
    * casts any atomic argument), so one registration serves every value
    * type — the reference's UDAFs are likewise value-type-erased at the
    * wire (scalar value in, state out).
    */
  case class HllIn(value: String, op: Int)
  case class PctIn(value: Option[Double], op: Int)

  /** approx count-distinct under retraction: delegates to
    * [[RetractableHll]] (per-register rank counters), hashing the value
    * on the way in and ignoring NULLs (matching count(distinct)).
    */
  val retractableHll: Aggregator[HllIn, RetractableHll.Buf, Long] =
    new Aggregator[HllIn, RetractableHll.Buf, Long] {
      private val d = RetractableHll.aggregator
      def zero: RetractableHll.Buf = d.zero
      def reduce(b: RetractableHll.Buf, a: HllIn): RetractableHll.Buf =
        if (a.value == null || a.op == 0) b
        else d.reduce(b, RetractableHll.In(hash64(a.value), a.op))
      def merge(x: RetractableHll.Buf, y: RetractableHll.Buf): RetractableHll.Buf =
        d.merge(x, y)
      def finish(b: RetractableHll.Buf): Long = d.finish(b)
      def bufferEncoder: Encoder[RetractableHll.Buf] = d.bufferEncoder
      def outputEncoder: Encoder[Long] = d.outputEncoder
    }

  /** approx percentile under retraction: delegates to
    * [[RetractablePercentile]]'s log-bucket histogram at the quantile /
    * error the CREATE AGGREGATE's WITH clause declared.
    */
  def retractablePercentile(quantile: Double, relativeError: Double)
      : Aggregator[PctIn, RetractablePercentile.Buf, Option[Double]] =
    new Aggregator[PctIn, RetractablePercentile.Buf, Option[Double]] {
      private val d = RetractablePercentile.aggregator(quantile, relativeError)
      def zero: RetractablePercentile.Buf = d.zero
      def reduce(b: RetractablePercentile.Buf, a: PctIn): RetractablePercentile.Buf =
        a.value match {
          case Some(v) => d.reduce(b, RetractablePercentile.In(v, isNull = false, a.op))
          case None => b
        }
      def merge(x: RetractablePercentile.Buf, y: RetractablePercentile.Buf)
          : RetractablePercentile.Buf = d.merge(x, y)
      def finish(b: RetractablePercentile.Buf): Option[Double] = d.finish(b)
      def bufferEncoder: Encoder[RetractablePercentile.Buf] = d.bufferEncoder
      def outputEncoder: Encoder[Option[Double]] = d.outputEncoder
    }

  /** Implementation keys `CREATE AGGREGATE … AS '<key>'` resolves, with
    * their call signatures (how SQL text invokes the created name).
    */
  val implementations: Map[String, String] = Map(
    "retractable_hll" -> "(value ANY, op INT) RETURNS BIGINT",
    "retractable_percentile" ->
      "(value DOUBLE, op INT) RETURNS DOUBLE — WITH (quantile [, relative_error])")

  /** Bind `name` to implementation `impl` in the session's function
    * registry. Returns the bound signature (for SHOW AGGREGATES).
    */
  def register(spark: SparkSession, name: String, impl: String,
      options: Map[String, String]): String = impl match {
    case "retractable_hll" =>
      require(options.isEmpty, s"CREATE AGGREGATE $name: '$impl' takes no options")
      spark.udf.register(name, udaf(retractableHll))
      implementations(impl)
    case "retractable_percentile" =>
      val q = options.getOrElse("quantile", throw new IllegalArgumentException(
        s"CREATE AGGREGATE $name: '$impl' requires WITH (quantile = …)")).toDouble
      require(q >= 0.0 && q <= 1.0, s"CREATE AGGREGATE $name: quantile $q not in [0,1]")
      val e = options.getOrElse("relative_error", "0.01").toDouble
      require(e > 0.0 && e < 1.0, s"CREATE AGGREGATE $name: relative_error $e not in (0,1)")
      spark.udf.register(name, udaf(retractablePercentile(q, e)))
      implementations(impl)
    case other => throw new IllegalArgumentException(
      s"CREATE AGGREGATE $name: unknown implementation '$other' " +
        s"(available: ${implementations.keys.toSeq.sorted.mkString(", ")})")
  }
}
