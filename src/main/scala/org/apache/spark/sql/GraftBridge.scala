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

  /** Register a native-expression SQL function on a live session —
    * `sessionState`/`FunctionRegistry` sit behind `private[sql]` in
    * Spark 4, same visibility story as the Column converters above.
    * Config-time injection ([[graft.GraftExtensions]]) needs no bridge.
    */
  def registerFunction(spark: SparkSession,
      id: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
}
