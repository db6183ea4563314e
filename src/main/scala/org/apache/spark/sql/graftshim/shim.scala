package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionColumnNode}

/** Bridge between graft's Catalyst expressions and the public Column API.
  *
  * Spark 4 made `Column` a thin wrapper over `ColumnNode`; the
  * Expression<->Column converters live behind `private[sql]`, so this tiny
  * shim (placed inside the sql package, the sanctioned extension-library
  * pattern) is the only non-public-API touchpoint in the codebase.
  */
object ColumnBridge {
  def column(e: Expression): Column = Column(ExpressionColumnNode(e))
  def expression(c: Column): Expression = ColumnNodeToExpressionConverter(c.node)
}
