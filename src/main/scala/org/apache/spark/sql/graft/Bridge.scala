package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Spark 4.x made [[Column]] expression-agnostic (ColumnNode based); the
  * classic Expression accessors are `private[sql]`. This tiny shim lives in
  * the `org.apache.spark.sql` namespace to expose the two conversions our
  * custom Catalyst expressions need. No Spark internals are modified.
  */
object Bridge {
  /** Wrap a Catalyst Expression as a user-facing Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Extract the Catalyst Expression backing a Column. */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a LogicalPlan as a DataFrame (classic Dataset.ofRows is
    * private[sql]). */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The analyzed LogicalPlan behind a DataFrame. */
  def logicalPlan(df: DataFrame): LogicalPlan = df.queryExecution.analyzed
}
