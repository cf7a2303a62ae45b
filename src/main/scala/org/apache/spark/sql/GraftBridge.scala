package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's private[sql] Column <-> Expression converters
  * (Spark 4 removed the public Column(expr) constructor). Lives in the
  * org.apache.spark.sql package solely to access classic.ExpressionUtils;
  * the rest of the engine goes through this one indirection. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
