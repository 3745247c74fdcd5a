package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column↔Expression converters.
  *
  * Spark 4's connect/classic split made `Column` expression-free in the
  * public API; the classic converters (`ExpressionUtils.column` /
  * `.expression`) are `private[sql]`. Graft's registry-backed expressions
  * go through `call_function` and never need this — the ONE exception is
  * an expression that must carry a non-Expression constructor argument
  * (a `Broadcast` handle), which the function registry cannot convey.
  * This object is the minimal, package-placed access point for that case;
  * keep it to these two forwarders.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
