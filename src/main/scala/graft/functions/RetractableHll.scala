package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Approximate count-distinct that supports RETRACTION — the updatable
  * HyperLogLog of the reference
  * (src/expr/impl/src/aggregate/approx_count_distinct/mod.rs:34: per-
  * register COUNTERS per rank instead of a plain max, so a delete can
  * decrement and the register max can fall back to the next live rank).
  *
  * Spark's builtin `approx_count_distinct` keeps only register maxima —
  * fine for append-only streams, wrong under deletes. This Aggregator is
  * the changelog-correct variant for MV maintenance.
  *
  * Buffer: counts keyed by register*64+rank (m=1024 registers). Estimate:
  * standard HLL with small-range linear counting.
  */
object RetractableHll {

  val NumRegisters = 1024 // 2^10
  private val RegisterBits = 10

  case class In(hash: Long, op: Int) // op: +1 insert, -1 delete

  // (register << 6 | rank) -> live count. Mutable: reduce/merge run once
  // per input row in the aggregation hot loop, and the Aggregator
  // contract allows mutating and returning the buffer — a persistent map
  // would allocate tree nodes per row for nothing.
  type Buf = scala.collection.mutable.HashMap[Int, Long]

  private def regRank(hash: Long): Int = {
    val reg = (hash & (NumRegisters - 1)).toInt
    val rest = hash >>> RegisterBits
    // rank = position of first 1-bit (1-based); capped to fit 6 bits
    val rank = math.min(java.lang.Long.numberOfTrailingZeros(rest | (1L << 54)) + 1, 54)
    (reg << 6) | rank
  }

  val aggregator: Aggregator[In, Buf, Long] = new Aggregator[In, Buf, Long] {
    def zero: Buf = scala.collection.mutable.HashMap.empty
    // Counts may go NEGATIVE transiently: partial aggregation can apply a
    // delete before the matching insert arrives in another partition's
    // buffer — only an exact zero may be dropped, or merge cannot cancel.
    def reduce(b: Buf, a: In): Buf = {
      val k = regRank(a.hash)
      val n = b.getOrElse(k, 0L) + a.op
      if (n == 0) b.remove(k) else b.update(k, n)
      b
    }
    def merge(x: Buf, y: Buf): Buf = {
      y.foreach { case (k, n) =>
        val m = x.getOrElse(k, 0L) + n
        if (m == 0) x.remove(k) else x.update(k, m)
      }
      x
    }
    def finish(b: Buf): Long = {
      val maxRank = new Array[Int](NumRegisters)
      b.foreach { case (k, n) =>
        if (n > 0) {
          val reg = k >>> 6
          val rank = k & 63
          if (rank > maxRank(reg)) maxRank(reg) = rank
        }
      }
      val m = NumRegisters.toDouble
      val alpha = 0.7213 / (1 + 1.079 / m)
      val sum = maxRank.map(r => math.pow(2.0, -r)).sum
      val raw = alpha * m * m / sum
      val zeros = maxRank.count(_ == 0)
      val est =
        if (raw <= 2.5 * m && zeros > 0) m * math.log(m / zeros) // linear counting
        else raw
      math.round(est)
    }
    def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Column form: approx distinct of `value` under changelog ops.
    * `value` is hashed with xxhash64 (engine-internal — sketches don't
    * cross engines); `op` follows Changelog conventions (+1/-1 style:
    * pass `when(isAdd, 1).otherwise(-1)`). NULL values are ignored (op
    * forced to 0) — xxhash64(NULL) would otherwise register the seed as
    * a phantom distinct element, diverging from count(distinct).
    */
  def approxCountDistinctRetractable(value: Column, op: Column): Column = {
    val u = udaf(aggregator) // TypeTag-derived encoder for In
    u(xxhash64(value), when(value.isNull, 0).otherwise(op.cast("int")))
  }
}
