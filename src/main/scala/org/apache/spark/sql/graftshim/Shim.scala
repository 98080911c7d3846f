package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into `private[sql]` surface: Spark 4 removed the public
  * `Column(expr)` constructor; the supported conversion lives in
  * `org.apache.spark.sql.classic.ExpressionUtils`. This shim re-exports
  * just the two conversions needed to register custom Catalyst
  * expressions (e.g. [[graft.functions.MinHashSig]]) as Columns. */
object Shim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
