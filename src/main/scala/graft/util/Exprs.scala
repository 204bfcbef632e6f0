package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 Column <-> Catalyst Expression bridge. The `Column.expr` /
  * `new Column(expr)` shortcuts of Spark 3 moved behind `private[sql]`
  * ColumnNode plumbing, so this one-file shim lives in the
  * org.apache.spark.sql package — the standard pattern for Spark-native
  * extensions (expressions, strategies) that need the conversion.
  */
object GraftExprs {
  def toExpr(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)
  def toColumn(e: Expression): Column =
    Column(classic.ExpressionColumnNode(e))
}
