/* Declared in org.apache.spark.sql: Spark 4 rebased `Column` onto
 * ColumnNode (Connect/classic unification) and the classic
 * Column <-> catalyst Expression conversions are private[sql]. This tiny
 * bridge re-exports them for graft's native expressions
 * ([[graft.functions.Expressions]]); everything else in the build stays in
 * the public API.
 */
package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
