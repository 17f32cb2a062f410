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
}
