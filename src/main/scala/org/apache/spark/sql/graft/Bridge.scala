package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge. `classic.ExpressionUtils` is
  * `private[sql]` in Spark 4, so extension libraries route through a
  * same-package-tree shim (the standard pattern for Spark add-ons).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eagerly convert a Column's node tree into genuine Catalyst
    * expressions. [[expression]] wraps lazily as a `ColumnNodeExpression`,
    * which the analyzer only unwraps on the Dataset API path — an
    * expression injected through the FunctionRegistry (SQL path) keeps the
    * wrapper and dies at codegen as Unevaluable. This conversion produces
    * plain (possibly Unresolved*) Catalyst nodes the analyzer resolves
    * like any built-in.
    */
  def convertedExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
