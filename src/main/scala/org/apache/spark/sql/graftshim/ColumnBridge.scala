package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge from a raw Catalyst `Expression` to a user-facing `Column`.
  *
  * Spark 4 made the Column↔Expression conversion `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`); extensions that ship
  * custom codegen expressions conventionally expose it through a shim in an
  * `org.apache.spark.sql` subpackage. Used only by graft's native vector
  * expressions (`graft.functions.expr`).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a raw logical plan as a DataFrame (`Dataset.ofRows` went
    * `private[sql]` in Spark 4, same rationale as the Column bridge).
    * Used by graft's custom logical operators (`graft.plans`). */
  def dataFrame(spark: org.apache.spark.sql.SparkSession,
                plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
