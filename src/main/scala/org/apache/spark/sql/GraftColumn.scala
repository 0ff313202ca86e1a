package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge from a raw Catalyst Expression to the public Column API (the
  * classic converter is `private[sql]`; this is the one sanctioned seam for
  * libraries that ship custom expressions without a session-level function
  * registry — see SparkSessionExtensions for the SQL-surface route). */
object GraftColumn {
  def of(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** The Catalyst expression behind a Column (classic runtime). */
  def expr(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Eagerly CONVERT a Column's node tree to a real Catalyst expression
    * tree (UnresolvedFunction nodes and all) instead of the lazy opaque
    * `ColumnNodeExpression` wrapper [[expr]] produces. Required when the
    * expression is handed to the analyzer mid-resolution — a
    * function-registry builder returning the wrapper form dies at codegen
    * ("Cannot generate code for columnnodeexpression"), while this form
    * resolves in the analyzer's fixed point like any parsed expression. */
  def resolvedExpr(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter.apply(c.node)
}
