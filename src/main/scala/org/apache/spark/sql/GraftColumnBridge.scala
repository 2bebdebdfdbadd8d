package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column↔Expression converters — needed
  * to attach a custom Catalyst `Expression` (graft's codegen'd Jinja
  * renderer) to the public DataFrame API. Spark 4 removed the public
  * `Column(expr)` constructor with the Connect refactor; `classic.
  * ExpressionUtils` is the blessed internal path (public at the bytecode
  * level, `private[sql]` in Scala). This shim is the only file in the repo
  * living outside the `graft` namespace.
  */
object GraftColumnBridge {
  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
}
