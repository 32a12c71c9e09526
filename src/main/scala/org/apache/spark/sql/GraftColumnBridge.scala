package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column <-> Expression conversions, so graft
  * code can wrap its native Catalyst expressions (constant-matrix ANN ops,
  * band-bucket hashing) into `Column`s without going through the function
  * registry. Same shim pattern as the DSv2/JDBC dialect hooks in this
  * source tree.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
