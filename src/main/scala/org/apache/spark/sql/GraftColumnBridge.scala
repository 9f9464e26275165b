package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the private[sql] Expression↔Column converters — the standard
  * shim for libraries that ship custom Catalyst expressions against
  * Spark 4 (where ExpressionUtils went private[sql]). Nothing else in
  * this package; all engine code lives under graft.*.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
