package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge to the `private[sql]` Column ⇄ Expression converters —
  * the supported extension seam for libraries that define native Catalyst
  * expressions against Spark 4's split Column API. */
object GraftInterop {
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)
}
