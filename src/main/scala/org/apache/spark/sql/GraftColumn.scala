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
}
