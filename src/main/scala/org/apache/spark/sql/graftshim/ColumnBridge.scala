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

  /** Free the block-manager storage behind a `localCheckpoint(eager=true)`
    * Dataset. The checkpointed data lives on the RDD inside the plan's
    * `LogicalRDD` — `Dataset.unpersist` cannot reach it (the checkpoint is
    * not registered with the CacheManager), so iterative algorithms that
    * checkpoint per round must release superseded rounds through the RDD
    * itself. No-op on plans that are not checkpoint scans. */
  def unpersistCheckpoint(df: org.apache.spark.sql.DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case r: org.apache.spark.sql.execution.LogicalRDD =>
        r.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Wrap a raw logical plan as a DataFrame (`Dataset.ofRows` went
    * `private[sql]` in Spark 4, same rationale as the Column bridge).
    * Used by graft's custom logical operators (`graft.plans`). */
  def dataFrame(spark: org.apache.spark.sql.SparkSession,
                plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
