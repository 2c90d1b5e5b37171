package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Expression <-> Column bridge. Spark 4's `Column` wraps a ColumnNode and
 * the converters live in `private[sql] ExpressionUtils`, so third-party
 * Catalyst expressions need this one-file shim inside the sql package
 * namespace (the conventional pattern for Spark extension libraries).
 */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
