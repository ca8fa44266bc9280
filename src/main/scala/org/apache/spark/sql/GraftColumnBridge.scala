package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ↔ Expression bridge. Spark 4 moved `Column` to sql-api
  * (ColumnNode-backed) and made the classic converters `private[sql]`;
  * custom Catalyst expressions still need both directions. This shim
  * lives in the org.apache.spark.sql package purely to re-export the
  * two conversions — no Spark internals are modified.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
