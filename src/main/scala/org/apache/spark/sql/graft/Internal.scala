package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession, classic}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one sanctioned crossing into Spark's `private[sql]` surface:
  * building a DataFrame from a custom LogicalPlan (there is no public
  * constructor for that — every extension project hosts this same
  * two-line bridge in a child package of org.apache.spark.sql).
  * Nothing else in graft lives outside the graft.* namespace.
  */
object Internal {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
