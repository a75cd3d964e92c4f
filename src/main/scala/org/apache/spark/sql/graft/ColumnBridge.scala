package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression seam for the engine's custom Catalyst
  * expressions (graft.functions). Spark 4 moved the classic
  * `Column(expr)` constructor behind `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`), so third-party
  * expression libraries expose it through a one-object package bridge —
  * the established pattern in public Spark extension libraries. This is
  * the only file outside the `graft` package and it contains no logic.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
