package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> catalyst Expression bridge. ExpressionUtils is private[sql]
  * in Spark 4's classic module, so custom native expressions (e.g.
  * graft.expressions.Md5Long60) go through this in-package shim — the
  * standard extension pattern for libraries that add codegen expressions
  * without a SparkSessionExtensions registration step.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
