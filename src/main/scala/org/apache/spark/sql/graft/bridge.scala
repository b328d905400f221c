package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge. Spark 4 keeps `ExpressionUtils` (and the
  * `AbstractDataType` hierarchy) `private[sql]`, so a library shipping
  * custom Catalyst expressions needs this one-file shim inside the
  * `org.apache.spark.sql` namespace — the same pattern every Spark
  * extension library uses. Nothing else in this repo lives outside
  * `graft.*`.
  */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a function builder into an ALREADY-RUNNING session's
    * registry (extensions only apply at session build time).
    */
  def registerFunction(
      spark: org.apache.spark.sql.SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "scala_udf")
}
