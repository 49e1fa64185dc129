package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, ExpressionUtils}

/** Second (and last) Spark-internal bridge, for the SQL DML router
  * ([[graft.sql.GraftSql]]): turning the pieces Spark's OWN parser
  * hands back — a `LogicalPlan` subtree for an INSERT's source query,
  * a Catalyst `Expression` for a WHERE/WHEN condition — into the
  * public `DataFrame`/`Column` values the [[graft.operators.TimeTravel]]
  * mutation API takes. Both conversions are `private[sql]` in Spark
  * (`Dataset.ofRows`, `ExpressionUtils.column`); Delta ships the same
  * two bridges inside its `org.apache.spark.sql.delta` package for the
  * same reason. No behavior here, only access. */
object DmlBridge {

  /** A parsed (unresolved) plan as a DataFrame on `spark` — analysis
    * runs when the frame is used, exactly like `spark.sql`. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** A parsed (unresolved) expression as a Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)
}
