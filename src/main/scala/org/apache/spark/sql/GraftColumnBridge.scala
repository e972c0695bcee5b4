package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to Spark 4's sql-private Column <-> Expression conversions
  * (org.apache.spark.sql.classic.ExpressionUtils), needed to expose
  * custom Catalyst expressions as Columns. Lives in the spark.sql
  * package solely to cross the private[sql] boundary.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
