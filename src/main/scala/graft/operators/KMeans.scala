package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Relational k-means over an embedding column — the coarse quantizer for
  * IVF-style ANN (no MLlib dependency; every step is a DataFrame op so it
  * scales with the cluster like any other query).
  *
  * Initialization is deterministic (first k vectors by id — adequate for
  * a coarse quantizer; k-means++ is a drop-in replacement). Each
  * iteration: assign (cross join vs broadcast centroids, argmin L2) →
  * recompute (posexplode to (cluster, dim, value), mean per cell,
  * collect_list back) — one shuffle per iteration.
  */
object KMeans {

  /** Fit k centroids; returns (cluster_id, centroid array<double>). */
  def fit(data: DataFrame, idCol: String, vecCol: String,
      k: Int, iterations: Int = 5): DataFrame = {
    val spark = data.sparkSession
    val vecs = data.select(col(idCol).as("__id"),
      VectorFunctions.toDoubleVec(col(vecCol)).as("__v"))
    var centroids = vecs.orderBy("__id").limit(k)
      .select((row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("__id")) - 1)
        .as("cluster_id"), col("__v").as("centroid"))
      .localCheckpoint(true)
    var i = 0
    while (i < iterations) {
      val assigned = assign(vecs, "__v", centroids)
      val next = assigned
        .select(col("cluster_id"), posexplode(col("__v")))
        .groupBy("cluster_id", "pos")
        .agg(avg("col").as("m"))
        .groupBy("cluster_id")
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cluster_id"),
          transform(col("pm"), p => p.getField("m")).as("centroid"))
      centroids = next.localCheckpoint(true)
      i += 1
    }
    centroids
  }

  /** Assign each row its nearest centroid (broadcast argmin). */
  def assign(data: DataFrame, vecCol: String, centroids: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__aid").orderBy(col("__dist").asc, col("cluster_id").asc)
    val withId = data.withColumn("__aid", monotonically_increasing_id())
    withId.join(broadcast(centroids))
      .withColumn("__dist",
        VectorFunctions.l2Distance(col(vecCol), col("centroid")))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__dist", "__rn", "centroid", "__aid")
  }
}
