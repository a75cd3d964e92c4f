package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession}
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

  /** Register a temp SQL function on an existing session (the
    * build-time path is `graft.functions.GraftExtensions` via
    * `spark.sql.extensions`; this covers sessions the caller didn't
    * construct, e.g. the driver-provided one). */
  def registerTempFunction(spark: SparkSession, name: String,
    builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
