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

  /** Assign each row its nearest centroid (broadcast argmin).
    *
    * The centroid set is packed into ONE broadcast row and the argmin is
    * a per-row array_min over (distance, cluster_id) structs — struct
    * ordering IS (dist asc, cluster_id asc), the same tie-break as the
    * previous window formulation, which expanded every row k ways and
    * shuffled n·k rows on a per-row id just to rank them (guide §2.4:
    * remove shuffles outright). The squared distance orders identically
    * to the distance (sqrt is monotone) and skips the per-row sqrt.
    */
  def assign(data: DataFrame, vecCol: String, centroids: DataFrame): DataFrame = {
    val packed = centroids.agg(
      array_sort(collect_list(struct(col("cluster_id"), col("centroid"))))
        .as("__cents"))
    val best = array_min(transform(col("__cents"), c =>
      struct(
        VectorFunctions.fastL2DistSq(data.sparkSession,
          col(vecCol), c.getField("centroid")).as("d"),
        c.getField("cluster_id").as("cluster_id"))))
    data.join(broadcast(packed))
      .withColumn("cluster_id", best.getField("cluster_id"))
      .drop("__cents")
  }
}
