package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

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
}
