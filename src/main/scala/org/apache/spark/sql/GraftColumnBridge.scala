package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column<->Expression converters so the
  * library can compose its native Catalyst expressions (e.g.
  * [[graft.plans.PrefixOffsets]]) as ordinary `Column`s without requiring a
  * session-level function registration. Spark 4 moved these behind
  * `classic.ExpressionUtils` (columnNodeSupport.scala); this one-file
  * package shim is the standard third-party access path.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Wrap a (possibly custom) logical plan as a DataFrame — the access
    * path for whole-operator extensions (e.g. graft.plans.AsofJoinNode),
    * mirroring what `Dataset.ofRows` does for Spark's own nodes. */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan of a DataFrame (for resolving attributes
    * when assembling custom plan nodes). */
  def analyzed(df: DataFrame):
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed
}
