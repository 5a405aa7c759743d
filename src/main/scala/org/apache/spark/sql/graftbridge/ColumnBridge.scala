package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Classic-mode Column <-> Catalyst Expression bridge.
  *
  * Spark 4's public `Column` wraps a ColumnNode and the conversion helpers
  * (`org.apache.spark.sql.classic.ExpressionUtils`) are `private[sql]`, so
  * library code that defines native Catalyst expressions needs this one
  * in-package accessor — the established pattern for Spark extension
  * libraries (cf. the public extension projects that place factories in
  * `org.apache.spark.sql`).
  */
object ColumnBridge {
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)
}
