package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Doorway to the package-private `Dataset.ofRows` — the standard way
  * an operator library materializes a custom [[LogicalPlan]] node as a
  * DataFrame (same pattern public Spark-extension projects use to
  * create datasets from plans). Nothing else from the private API is
  * touched.
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
