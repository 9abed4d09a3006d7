package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column ⇄ Expression converters.
  *
  * Spark 4 split the public `Column` API from Catalyst `Expression`s
  * (Spark Connect); third-party Catalyst extensions (our native
  * indicator aggregates, graft.functions) still need the classic hop,
  * which lives behind `private[sql]` in
  * `org.apache.spark.sql.classic.ExpressionUtils`. This shim is the
  * standard extension-library pattern for reaching it.
  */
object GraftSqlShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
