package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal accessor for the `private[sql]` Column↔Expression conversions —
  * the standard pattern for libraries contributing native Catalyst
  * expressions (Spark 4 made `new Column(expr)` internal). Nothing else of
  * Spark's internals is touched from this package.
  */
object GraftExpressionBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Apply a SparkSessionExtensions' injected functions to an ALREADY
    * RUNNING session (`registerFunctions` is `private[sql]`). Production
    * sessions get extensions at build time via `spark.sql.extensions`;
    * this hook lets tests exercise the same injection payload without
    * tearing down the shared test session.
    */
  def applyFunctionExtensions(ext: SparkSessionExtensions,
                              spark: SparkSession): Unit =
    ext.registerFunctions(
      spark.sessionState.functionRegistry)
}
