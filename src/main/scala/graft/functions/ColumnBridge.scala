package org.apache.spark.sql
package graftshim

import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 made the `Column` ↔ Catalyst `Expression` bridge
  * (`classic.ExpressionUtils`) `private[sql]` as part of the Spark Connect
  * column unification. Custom Catalyst expressions still need it, so this shim
  * lives in the `org.apache.spark.sql` namespace to re-export the two
  * conversions for graft's native expressions (e.g. `JavaHashCode`).
  */
object ColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
