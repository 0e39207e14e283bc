package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark 4's `private[sql]` Column↔Expression converters so
  * graft's native Catalyst expressions can be exposed as `Column`s.
  * Lives in the spark.sql package purely for access; a common pattern
  * for Spark extension libraries.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Apply a [[SparkSessionExtensions]] instance's injected functions
    * to an EXISTING session's registry — `spark.sql.extensions` only
    * takes effect at session construction, so tests (which share one
    * session per JVM) exercise the extension wiring through this hook
    * instead of building a second SparkContext. */
  def registerInjectedFunctions(
      ext: SparkSessionExtensions, spark: SparkSession): Unit =
    ext.registerFunctions(spark.sessionState.functionRegistry)
}
