package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The single private[sql] doorway the custom-operator path needs:
  * building a DataFrame from a hand-constructed logical node (Spark's own
  * operators go through the parser/Dataset API, which cannot spell
  * [[graft.plans.AsOfJoin]]). Lives in `org.apache.spark.sql` purely for
  * access; everything else in this library stays in `graft.*`. */
object GraftShims {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
