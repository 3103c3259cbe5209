package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Package-placed accessor for building a DataFrame from a Catalyst
  * [[LogicalPlan]] (`Dataset.ofRows` is `private[sql]`). Used for plan
  * surgery the public API can't express — e.g. replaying a chained
  * aggregate's defining query WITHOUT its HAVING filter to derive the
  * delta's touched group keys (graft.Engine.chainAggKeysFn).
  */
object GraftPlans {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
