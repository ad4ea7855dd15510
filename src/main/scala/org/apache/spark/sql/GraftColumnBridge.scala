package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the sql-package-private Expression ↔ Column converters —
  * the supported seam for libraries that add native Catalyst expressions
  * (cf. every Spark extension that ships custom expressions). Kept to the
  * two one-line forwarders; everything else in this library lives in the
  * public API. */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
