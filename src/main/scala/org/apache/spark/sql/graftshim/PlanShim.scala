package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, SparkSession => CSpark}

/** The one Spark-internal doorway the custom-plan tier needs: wrap a
  * hand-built [[LogicalPlan]] back into the public Dataset API. The
  * `classic.Dataset` companion is `private[sql]`, so this shim lives in
  * a subpackage of `org.apache.spark.sql` solely to re-export `ofRows`
  * — no other internals are touched.
  */
object PlanShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[CSpark], plan)
}
