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

  /** A MATERIALIZED cached DataFrame re-rooted at its InMemoryRelation
    * LEAF — the plan CacheManager substitutes at execution time anyway,
    * surfaced at the LOGICAL level so downstream compositions analyze a
    * one-node leaf instead of re-walking (and re-printing) the cached
    * frame's entire child tree per reference. Deep barrier chains
    * (curate -> release) otherwise pay analyzer time multiplicative in
    * composition depth. None when the frame is not in the cache (the
    * caller should then use the frame as-is). Execution semantics are
    * unchanged: the same InMemoryTableScan, the same unpersist
    * lifecycle (an unpersisted relation recomputes through its cached
    * child plan like any RDD whose persistence was dropped).
    */
  def cachedLeaf(df: org.apache.spark.sql.DataFrame)
      : Option[org.apache.spark.sql.DataFrame] = {
    val classic = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
    val spark = classic.sparkSession
    spark.sharedState.cacheManager.lookupCachedData(spark, classic.logicalPlan)
      .map(cd => org.apache.spark.sql.classic.Dataset.ofRows(spark,
        cd.cachedRepresentation))
  }

  /** AbstractDataType is private[sql], but ExpectsInputTypes /
    * ImplicitCastInputTypes implementations must name it in their
    * `inputTypes` signature — this public alias (legal: defined inside
    * the sql package) lets graft expressions declare expected input
    * types so Catalyst inserts implicit casts (e.g. array<float> ->
    * array<double>) instead of the eval reading mis-strided memory.
    */
  type ADT = org.apache.spark.sql.types.AbstractDataType
}
