package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils

/** The one place the library touches `private[sql]` Spark API: building a
  * DataFrame from a custom logical plan and unwrapping a Column to its
  * Catalyst expression — what any whole-operator extension needs
  * (SparkSessionExtensions covers rules/strategies but offers no
  * plan-construction hook). Lives under org.apache.spark.sql.* solely for
  * access; kept minimal and auditable.
  */
object GraftSqlBridge {

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  def column(e: Expression): Column = ExpressionUtils.column(e)
}
