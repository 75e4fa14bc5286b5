package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.Column

/** Minimal bridge into Spark's `private[sql]` Column ↔ Expression
  * converters (Spark 4 moved them under `classic`). Lives in the spark
  * namespace purely for access; everything else in the engine is in
  * `graft.*`. This is the sanctioned pattern for Catalyst extensions that
  * expose native Expressions as user-facing Columns.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a function builder in the session's FunctionRegistry so it
    * is callable from `spark.sql(...)` — the sanctioned temp-function
    * route (same mechanism as `createOrReplaceTempFunction`). */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")

  /** Apply a SparkSessionExtensions' injected functions to a fresh
    * registry — lets tests assert the `spark.sql.extensions` route without
    * building a whole new SparkSession (`registerFunctions` is
    * private[sql]). */
  def appliedFunctionRegistry(
      ext: org.apache.spark.sql.SparkSessionExtensions)
      : org.apache.spark.sql.catalyst.analysis.FunctionRegistry =
    ext.registerFunctions(
      new org.apache.spark.sql.catalyst.analysis.SimpleFunctionRegistry)
}
