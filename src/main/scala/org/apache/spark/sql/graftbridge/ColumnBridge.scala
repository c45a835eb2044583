package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 hides the classic converters
  * behind `private[sql]`; a library shipping native Catalyst expressions
  * (e.g. [[graft.functions.SortedIntersectSize]]) needs exactly these
  * two calls, so we expose them from inside the sql package tree — the
  * same technique used by Spark-native libraries in the wild. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
