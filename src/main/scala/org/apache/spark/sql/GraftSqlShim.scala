package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** `private[sql]`-access shim (the standard Spark-extension-library
  * technique): wraps a custom resolved [[LogicalPlan]] in a DataFrame.
  * This is the only file outside the `graft` package; it contains no
  * logic beyond the delegation. */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
