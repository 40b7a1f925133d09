package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into the `private[sql]` Dataset factory so graft's custom
  * logical plans (e.g. `graft.plans.AsOfJoinPlan`) can be surfaced as
  * DataFrames — the one unavoidable private-API touchpoint for a
  * library adding whole-operator plans (the same doorway Spark's own
  * connectors and Delta use).
  */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
