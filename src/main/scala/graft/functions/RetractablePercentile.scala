package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Approximate percentile that supports RETRACTION — the reference's
  * streaming `approx_percentile` (two-phase log-bucket histogram,
  * src/stream/src/executor/approx_percentile/{local,global_state}.rs):
  * values land in exponent buckets of base `(1+e)/(1-e)` (local.rs:68
  * `bucket = ceil(log_base |v|)`), deletes decrement bucket counts, and
  * the output walks negative buckets descending, zeros, then positive
  * buckets ascending until the quantile count is covered
  * (global_state.rs:305-331), emitting `sign · 2·baseⁱ/(base+1)` — the
  * guaranteed-relative-error midpoint of the bucket.
  *
  * Spark's builtin `percentile_approx` (KLL-ish) cannot retract — fine
  * for append-only streams, wrong under deletes. This Aggregator is the
  * changelog-correct variant for MV maintenance, with the same
  * map-side-combine shape as [[RetractableHll]].
  */
object RetractablePercentile {

  case class In(value: Double, isNull: Boolean, op: Int)

  /** Bucket key: `2·ceil(log_base |v|) + signBit`; zeros tracked under
    * the dedicated key [[ZeroKey]] (log of 0 has no bucket). Mutable:
    * reduce/merge run once per input row in the aggregation hot loop and
    * the Aggregator contract allows in-place buffer mutation.
    */
  type Buf = scala.collection.mutable.HashMap[Int, Long]

  private val ZeroKey = Int.MinValue

  def base(relativeError: Double): Double =
    (1.0 + relativeError) / (1.0 - relativeError)

  private def bucketOf(v: Double, b: Double): Int =
    if (v == 0.0) ZeroKey
    else {
      val i = math.ceil(math.log(math.abs(v)) / math.log(b)).toInt
      if (v > 0) i << 1 else (i << 1) | 1
    }

  def aggregator(quantile: Double, relativeError: Double)
      : Aggregator[In, Buf, Option[Double]] =
    new Aggregator[In, Buf, Option[Double]] {
      private val b = base(relativeError)
      def zero: Buf = scala.collection.mutable.HashMap.empty
      // Counts may go NEGATIVE transiently: a partial buffer can see the
      // delete before another partition's buffer sees the matching
      // insert — only exact zero may be dropped, or merge can't cancel.
      def reduce(buf: Buf, a: In): Buf = {
        if (!a.isNull && a.op != 0) {
          val k = bucketOf(a.value, b)
          val n = buf.getOrElse(k, 0L) + a.op
          if (n == 0) buf.remove(k) else buf.update(k, n)
        }
        buf
      }
      def merge(x: Buf, y: Buf): Buf = {
        y.foreach { case (k, n) =>
          val m = x.getOrElse(k, 0L) + n
          if (m == 0) x.remove(k) else x.update(k, m)
        }
        x
      }
      def finish(buf: Buf): Option[Double] = {
        val live = buf.filter(_._2 > 0)
        val total = live.values.sum
        if (total <= 0) None
        else {
          val quantileCount = math.floor((total - 1).toDouble * quantile).toLong
          // negative buckets: larger bucket id = larger |v| = SMALLER
          // value, so walk ids descending (reference iterates .rev())
          val negs = live.collect { case (k, n) if k != ZeroKey && (k & 1) == 1 =>
            (k >> 1, n) }.toSeq.sortBy(-_._1)
          val pos = live.collect { case (k, n) if k != ZeroKey && (k & 1) == 0 =>
            (k >> 1, n) }.toSeq.sortBy(_._1)
          val zeros = live.getOrElse(ZeroKey, 0L)
          var acc = 0L
          var out: Option[Double] = None
          for ((i, n) <- negs if out.isEmpty) {
            acc += n
            if (acc > quantileCount) out = Some(-2.0 * math.pow(b, i) / (b + 1.0))
          }
          if (out.isEmpty) {
            acc += zeros
            if (acc > quantileCount) out = Some(0.0)
          }
          for ((i, n) <- pos if out.isEmpty) {
            acc += n
            if (acc > quantileCount) out = Some(2.0 * math.pow(b, i) / (b + 1.0))
          }
          out
        }
      }
      def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
      def outputEncoder: Encoder[Option[Double]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Option[Double]]()
    }

  /** Column form: approx percentile of `value` under changelog ops
    * (+1 insert / -1 delete, e.g. `when(isAdd, 1).otherwise(-1)`).
    * NULLs are ignored, matching the reference and percentile_cont.
    */
  def approxPercentileRetractable(value: Column, op: Column,
      quantile: Double, relativeError: Double = 0.01): Column = {
    val u = udaf(aggregator(quantile, relativeError))
    u(coalesce(value.cast("double"), lit(0.0)), value.isNull, op.cast("int"))
  }
}
