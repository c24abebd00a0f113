package org.apache.spark.sql
package graft

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between graft's custom Catalyst expressions and the public
  * Column API. `ExpressionUtils.column/expression` are private[sql] in
  * Spark 4, so this one-file shim lives under org.apache.spark.sql. */
object ColumnShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
