package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column <-> Expression converters so the
  * library can wrap its own native Catalyst expressions (e.g.
  * graft.functions.DotProduct) in public `Column`s. The same pattern the
  * Spark OSS ecosystem uses for custom expressions on Spark 4's
  * ColumnNode API.
  */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** The ANSI divide-by-zero error (`QueryExecutionErrors` is
    * `private[sql]`) — thrown by graft.functions.L2Normalize on a zero
    * vector so the native form errors exactly like the declarative
    * `transform(d, _ / norm)` it replaced does under Spark 4's ANSI
    * default. */
  def divideByZeroError(): ArithmeticException =
    org.apache.spark.sql.errors.QueryExecutionErrors.divideByZeroError(null)

  /** Wrap a (custom) logical plan as a DataFrame — the seam every
    * whole-operator extension needs (`Dataset.ofRows` is private[sql]). */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
