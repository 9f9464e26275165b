package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into `private[sql]` constructors — the one sanctioned way
  * for an extension library to materialize a DataFrame from a custom
  * [[LogicalPlan]] node (`Dataset.ofRows` is package-private by design;
  * every Spark extension library ships this same three-line shim). Nothing
  * else in graft lives outside the `graft` namespace.
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
