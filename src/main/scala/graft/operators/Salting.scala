package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins (SURVEY.md "salting for skew").
  *
  * AQE's skew-join split handles sort-merge skew automatically; salting is
  * the explicit fallback for the cases AQE can't fix (e.g. a single giant
  * key in a shuffled hash join, or aggregation states that must be split).
  *
  * [[saltedJoin]]: the skewed (large) side gets a deterministic salt in
  * [0, n); the small side is replicated n×; the join key becomes
  * (key, salt). One giant key's rows spread over n reducers at the cost of
  * replicating the other side n times.
  */
object Salting {

  /** Deterministic salt derived from the row's other columns — stable
    * across retries (rand() would break task-retry idempotency).
    */
  private def saltOf(cols: Seq[Column], n: Int): Column =
    pmod(hash(cols: _*), lit(n))

  /** Inner equi-join with a salted left side. `leftSaltSource` picks the
    * columns whose hash spreads the skewed key's rows (default: all).
    */
  def saltedJoin(
      left: DataFrame, right: DataFrame, keys: Seq[String], n: Int,
      leftSaltSource: Seq[String] = Seq.empty): DataFrame = {
    val src = if (leftSaltSource.nonEmpty) leftSaltSource else left.columns.toSeq
    val l = left.withColumn("__salt", saltOf(src.map(col), n))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(n - 1))))
    l.join(r, keys :+ "__salt").drop("__salt")
  }

  /** Two-phase salted aggregation for decomposable aggregates: partial on
    * (keys, salt), final on keys. Spark's partial aggregation already
    * combines map-side; this variant additionally splits a hot key's
    * REDUCER work across n partitions (useful when a single group's
    * partial states are still huge — e.g. collect-like aggs).
    */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String, n: Int): DataFrame = {
    val salted = df.withColumn("__salt", saltOf(df.columns.toSeq.map(col), n))
    salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as(s"sum_$valueCol"))
  }
}
