package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the classic Column <-> catalyst Expression converters,
  * which went `private[sql]` in Spark 4's Connect refactor. Standard
  * extension-library pattern: a minimal adapter placed inside the
  * org.apache.spark.sql package; all engine code goes through here.
  */
object GraftColumnBridge {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** `types.AbstractDataType` is also `private[sql]` in Spark 4; this
    * alias lets engine expressions declare `inputTypes` (for
    * ImplicitCastInputTypes) from outside the package. */
  type AbstractType = types.AbstractDataType
}
