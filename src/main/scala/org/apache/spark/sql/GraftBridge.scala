package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to Spark's `private[sql]` Column ↔ Expression converters.
  *
  * Spark 4 hid the classic `Column(expr)` constructor behind
  * `org.apache.spark.sql.classic.ExpressionUtils`; third-party engines that
  * register native Catalyst expressions (our codegen'd distance kernels,
  * seed-0 xxHash64) need exactly these two conversions. Declaring this one
  * object inside `package org.apache.spark.sql` is the supported-by-visibility
  * way to reach them without reflection.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
