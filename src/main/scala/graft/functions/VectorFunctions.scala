package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Embedding-vector math over `array<float>` columns, as Catalyst
  * expressions (codegen'd; no UDF boxing). All arithmetic is promoted to
  * double and accumulated left-to-right, which keeps results bit-identical
  * across engines that fold sequentially.
  */
object VectorFunctions {

  /** Promote array<float> → array<double>. */
  def toDoubleVec(v: Column): Column = transform(v, x => x.cast(DoubleType))

  /** Dot product — the codegen'd [[graft.plans.DotProduct]] loop
    * (registered by GraftExtensions on every engine session). Same
    * value as the HOF fold it replaced on equal-length non-null
    * float/double arrays: both promote per element and accumulate
    * doubles left-to-right. Engine vector semantics on the edges:
    * truncate to the shorter length, skip null elements. Emitting the
    * native expression HERE (r11) instead of flipping the session-wide
    * `spark.graft.rewriteHofDot` rewrite keeps graft semantics confined
    * to graft's own function surface — a user's raw
    * `aggregate(zip_with(...))` SQL keeps exact Spark HOF semantics
    * (ADVICE r10).
    */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  /** The HOF formulation of [[dot]] — kept for sessions without the
    * graft function registry.
    */
  def hofDot(a: Column, b: Column): Column =
    aggregate(zip_with(toDoubleVec(a), toDoubleVec(b), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  /** Dot product via the native codegen'd [[graft.plans.DotProduct]]
    * expression when the session has it registered
    * (GraftSession.init / spark.sql.extensions), else the HOF fold.
    * Identical values: both accumulate doubles left-to-right.
    */
  def fastDot(spark: org.apache.spark.sql.SparkSession, a: Column, b: Column): Column =
    if (spark.catalog.functionExists("graft_dot")) call_function("graft_dot", a, b)
    else hofDot(a, b)

  /** L2 norm. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** L2 norm through the native dot when registered — same value as
    * [[l2Norm]] (equal arrays, sequential double fold), no HOF boxing.
    */
  def fastL2Norm(spark: org.apache.spark.sql.SparkSession, a: Column): Column =
    sqrt(fastDot(spark, a, a))

  /** Cosine similarity (0 for zero vectors). */
  def cosine(a: Column, b: Column): Column = {
    val denom = l2Norm(a) * l2Norm(b)
    when(denom > 0.0, dot(a, b) / denom).otherwise(0.0)
  }

  /** Euclidean (L2) distance — native squared-distance loop (same
    * sequential double fold as the HOF form it replaced; see [[dot]]).
    */
  def l2Distance(a: Column, b: Column): Column =
    sqrt(call_function("graft_l2distsq", a, b))

  /** SQUARED L2 distance through the native codegen'd loop when
    * registered (same sequential fold as the HOF form — bit-identical
    * on equal-length non-null arrays), else the HOF fold. Orders the
    * same as [[l2Distance]] (sqrt is monotone) — use for argmin/rank.
    */
  def fastL2DistSq(spark: org.apache.spark.sql.SparkSession, a: Column, b: Column): Column =
    if (spark.catalog.functionExists("graft_l2distsq"))
      call_function("graft_l2distsq", a, b)
    else aggregate(zip_with(toDoubleVec(a), toDoubleVec(b),
      (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)

  /** Sign bit (0/1) of the dot product with a deterministic pseudo-random
    * hyperplane derived from `seed` — the random-hyperplane LSH primitive.
    * Plane component i for seed s is ±1 from the parity of md5(s:i); the
    * signs are plan-time constants (folded on the driver — evaluating the
    * md5 per row per bit would cost dims×bits hashes per vector).
    */
  def hyperplaneSign(v: Column, seed: Int, dims: Int): Column = {
    val signs = Array.tabulate(dims)(i =>
      if (HashFunctions.md5LongLocal(s"$seed:$i") % 2 == 0) 1.0 else -1.0)
    // dot(v, plane) through the native loop — the plane is a literal
    // array<double>, so this is one codegen'd fold per bit, not an
    // interpreted zip_with + aggregate pair
    when(dot(v, typedlit(signs.toSeq)) > 0.0, 1).otherwise(0)
  }

  /** Unit-normalize a vector (zero vectors pass through unchanged). */
  def normalize(v: Column): Column = {
    val n = l2Norm(v)
    when(n > 0.0, transform(toDoubleVec(v), x => x / n)).otherwise(toDoubleVec(v))
  }

  /** Symmetric int8 quantization: round(x / scale) clamped to [-127,127]
    * — the storage layout that cuts a 100 TB float corpus 4×. Pair with
    * [[dequantize]] for scoring.
    */
  def quantize(v: Column, scale: Double): Column =
    transform(toDoubleVec(v), x =>
      greatest(lit(-127), least(lit(127), round(x / scale, 0).cast(IntegerType))))

  def dequantize(q: Column, scale: Double): Column =
    transform(q, x => x.cast(DoubleType) * scale)

  /** LSH bucket id from `nBits` hyperplane sign bits. */
  def lshBucket(v: Column, nBits: Int, dims: Int = 64): Column =
    lshBucketSeeded(v, nBits, 0, dims)

  /** [[lshBucket]] with the hyperplanes drawn from seed block
    * `seedBase` — banded LSH gives band k the block k·64 so every
    * band's planes are independent (band 0 IS the unseeded bucketing).
    */
  def lshBucketSeeded(v: Column, nBits: Int, seedBase: Int,
      dims: Int = 64): Column = {
    // Int bucket space: 31+ bits would overflow the (1 << b) weights and
    // collide buckets silently (autoBits caps at 30 for the same reason)
    require(nBits <= 30, s"lsh bucket width $nBits exceeds 30 bits")
    (0 until nBits).map(b => hyperplaneSign(v, seedBase + b, dims) * (1 << b))
      .reduce(_ + _).cast(IntegerType)
  }
}
