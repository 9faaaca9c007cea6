package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Interop shim: Spark 4 made the Expression↔Column bridge `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`); this object lives inside
  * the `org.apache.spark.sql` package tree to re-expose the two conversions
  * the graft library needs for its native expressions. No Spark internals are
  * modified — this is the same technique Spark-ecosystem libraries use to
  * attach custom Catalyst expressions to the public Column API.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
