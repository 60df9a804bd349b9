package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made these conversions
  * `private[sql]` (Column lives in sql-api and is backend-agnostic); a
  * library adding native Catalyst expressions uses an in-package bridge —
  * the conventional pattern for Spark extension libraries. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Full ColumnNode→Expression conversion — required when a Column built
    * from the public functions API (zip_with/aggregate/... compositions)
    * must become a catalyst tree OUTSIDE a Dataset operation, e.g. inside
    * a FunctionRegistry builder: `expression` defers with a wrapper node
    * that analysis never unwraps there; this converts eagerly. */
  def expressionTree(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
