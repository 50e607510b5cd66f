package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` doorway the custom-operator tier needs: construct
  * a DataFrame from a hand-built [[LogicalPlan]] (`Dataset.ofRows` — the
  * same entry point Spark's own parser/connectors use). Lives in this
  * package solely for access; contains no logic.
  */
object GraftShims {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
