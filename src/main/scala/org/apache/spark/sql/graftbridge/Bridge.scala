package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> catalyst Expression bridge. Spark 4 made Column wrap a
  * ColumnNode and gated the conversion helpers private[sql]; custom
  * native Expressions (preference (b) in SURVEY.md §7.5) still need the
  * two conversions, so this exposes exactly those and nothing else.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** AbstractDataType is private[sql], but ExpectsInputTypes /
    * ImplicitCastInputTypes implementations must name it in their
    * `inputTypes` signature — this public alias (legal: defined inside
    * the sql package) lets graft expressions declare expected input
    * types so Catalyst inserts implicit casts (e.g. array<float> ->
    * array<double>) instead of the eval reading mis-strided memory.
    */
  type ADT = org.apache.spark.sql.types.AbstractDataType
}
