package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recursive-CTE execution as a driver-side fixpoint loop — the Spark
  * rendering of the reference's RecursiveUnion plan node
  * (reference: src/frontend/src/optimizer/plan_node/logical_recursive_union.rs).
  *
  * Each iteration joins the frontier against the step relation and
  * anti-joins the accumulated result so only new rows survive; the loop
  * ends when the frontier empties. Scale notes: the accumulator is
  * re-checkpointed every few iterations to cut the lineage chain (long
  * iterative lineages blow up planning time and recovery cost).
  */
object IterativeFixpoint {

  /** Transitive closure of an edge set (columns `src`, `dst`).
    *
    * PATH DOUBLING (r10): each round joins the accumulated closure with
    * itself — reachable path lengths double per round, so convergence
    * takes O(log diameter) rounds instead of the O(diameter) of the old
    * frontier⋈edges step. Each driver-synchronized round is a fixed
    * stack of Spark jobs (join + distinct + anti-join + checkpoint +
    * count), so halving the round count halves the dominant fixed cost;
    * at 100 TB the log-round bound is also what keeps a deep graph's
    * closure from serializing into thousands of barriers. UNION-distinct
    * semantics are unchanged — the result SET is identical, only the
    * discovery schedule differs.
    */
  def transitiveClosure(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    var acc = edges.select("src", "dst").distinct().localCheckpoint(false)
    // ONE action per iteration: the count() doubles as the lazy
    // checkpoint's materializer and the loop condition
    var newRows = acc.count()
    var i = 0
    while (i < maxIter && newRows > 0) {
      val next = acc
        .select(col("src").as("fsrc"), col("dst").as("fdst"))
        .join(acc.select(col("src").as("esrc"), col("dst").as("edst")),
          col("fdst") === col("esrc"))
        .select(col("fsrc").as("src"), col("edst").as("dst"))
        .distinct()
        .join(acc, Seq("src", "dst"), "left_anti")
        // lazy: the count() below is the materializing action — an
        // eager checkpoint would spend a separate job per round
        .localCheckpoint(false)
      newRows = next.count()
      if (newRows > 0) acc = acc.union(next).localCheckpoint(false)
      i += 1
    }
    acc
  }

  /** Connected components of an undirected edge set (columns `src`,
    * `dst`) by min-label propagation: each node repeatedly adopts the
    * smallest component id among itself and its neighbors, converging in
    * O(component diameter) rounds — each round one join + one
    * aggregation, both on the node id (a single hash partitioning
    * reused), never materializing the O(n²) transitive closure. This is
    * the dedup-clustering primitive: near-dup PAIRS in, duplicate
    * CLUSTERS out (keep min-id representative per component).
    * Node ids must be integral (min-label ordering + the sum-based
    * convergence check).
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    val und = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint(false)
    var labels = und.select(col("src").as("id")).distinct()
      .withColumn("component", col("id")).localCheckpoint(false)
    // labels only ever DECREASE, so the global sum strictly decreases on
    // any effective round — equal consecutive sums mean convergence.
    // One cheap aggregate per round instead of an anti-join + isEmpty.
    // DECIMAL(38,0): a raw Long sum could wrap at 2⁶³-magnitude ids and
    // a changed round could alias the previous sum — decimal cannot.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      // coalesce: sum over an EMPTY label set is null (zero edges in)
      df.agg(coalesce(
          sum(col("component").cast(
            org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0))),
          lit(java.math.BigDecimal.ZERO)))
        .collect().head.getDecimal(0)
    var prevSum = labelSum(labels)
    var changed = true
    var i = 0
    while (changed && i < maxIter) {
      val viaNeighbor = und
        .join(labels.select(col("id").as("dst"), col("component")), "dst")
        .select(col("src").as("id"), col("component"))
      labels = labels.union(viaNeighbor)
        .groupBy("id").agg(min("component").as("component"))
        // lazy: labelSum below materializes the checkpoint in the same
        // job instead of paying a separate per-round materialize pass
        .localCheckpoint(false)
      val s = labelSum(labels)
      changed = s.compareTo(prevSum) != 0
      prevSum = s
      i += 1
    }
    labels
  }

  /** Generic fixpoint: iterate `step` over the accumulated set until no
    * new distinct rows appear (UNION semantics of a recursive CTE).
    */
  def fixpoint(base: DataFrame, step: DataFrame => DataFrame, maxIter: Int = 50): DataFrame = {
    var acc = base.distinct().localCheckpoint(false)
    var frontier = acc
    var frontierRows = frontier.count() // one action per iteration
    var i = 0
    while (i < maxIter && frontierRows > 0) {
      val next = step(frontier).distinct()
        .join(acc, acc.columns.toSeq, "left_anti")
        .localCheckpoint(false) // count() below materializes
      frontierRows = next.count()
      if (frontierRows > 0) acc = acc.union(next).localCheckpoint(false)
      frontier = next
      i += 1
    }
    acc
  }
}
