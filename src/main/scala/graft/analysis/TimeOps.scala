package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks as built-ins, re-expressed in
  * shuffle-friendly shapes (the preference-(a) route of SURVEY.md
  * §7.5: compose existing operators — no custom strategy needed):
  * AS-OF join (point-in-time lookup) and interval/range join. Both
  * carry exact DuckDB oracles (q60/q61 — DuckDB has native ASOF and
  * inequality joins to check against).
  */
object TimeOps {

  /** AS-OF LEFT join: for every left row, the LATEST right row of the
    * same key with `right.time <= left.time` (equality matches) — the
    * point-in-time join behind feature lookups ("the last purchase
    * before this click") that naive SQL can only express as a
    * correlated subquery or an inequality join.
    *
    * Shape at scale: UNION the two sides and carry the last non-null
    * right payload forward over a per-key time-ordered window — ONE
    * hash shuffle on the key plus a per-key sort, instead of the
    * inequality-join nested loop Spark would otherwise plan. (At
    * equality the right row sorts first, so it matches its own
    * timestamp; among equal-time right rows the GREATEST payload
    * struct wins — pass a deterministically-unique (key, time) right
    * side, e.g. pre-aggregated as q60 does, when that tiebreak
    * matters.) A pathologically hot key concentrates its sort on one
    * task — the standard window caveat; time-bucket the key (compose
    * with [[rangeJoinBucketed]]'s bucketing idea) if a single key's
    * history exceeds a task.
    *
    * Returns every left row + `asofCol`: a struct of the matched right
    * row's columns (minus the key, which equals the left's; the match
    * TIME rides in the struct — "when was the last purchase" is half
    * the point of an as-of join), null when no right row precedes
    * (LEFT semantics). SQL-null semantics match DuckDB's ASOF: right
    * rows with a null key or null time can never satisfy
    * `r.key = l.key AND r.time <= l.time` and are dropped up front
    * (otherwise NULLS-FIRST ordering would carry a null-time payload
    * into every row of its key); left rows always survive, null-keyed
    * or null-timed ones with a null match. Column names: `left` and
    * `right` may share names (the right side is folded into the
    * struct); `__side`/`__r` are reserved internals.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, time: String,
      asofCol: String = "asof"): DataFrame = {
    require(!left.columns.contains("__side") && !left.columns.contains("__r"),
      "asofJoin reserves the __side/__r column names")
    val rStruct = struct(right.columns.filterNot(_ == key).map(col): _*)
    val r = right.filter(col(key).isNotNull && col(time).isNotNull)
      .select(col(key), col(time), rStruct.as("__r"))
    val rType = r.schema("__r").dataType
    val l = left.withColumn("__side", lit(1))
      .withColumn("__r", lit(null).cast(rType))
    val u = r.withColumn("__side", lit(0))
      .select(l.columns.map {
        case c if c == key || c == time || c == "__side" || c == "__r" => col(c)
        case c => lit(null).cast(left.schema(c).dataType).as(c)
      }: _*)
      .unionByName(l)
    // right rows sort before left at equal time (__side 0 < 1); equal
    // (time, side) right rows order by the payload struct -> the
    // greatest struct is the one carried (deterministic)
    val w = Window.partitionBy(col(key))
      .orderBy(col(time), col("__side"), col("__r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn(asofCol, last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__side", "__r")
  }

  /** Gap-based sessionization: events of a key belong to one session
    * until a silence longer than `maxGap` splits them — the classic
    * event-analytics primitive (q30's lag-gap is its building block).
    * `session_no` is 1-based per key in time order (ties broken by
    * `tiebreak`, so the numbering is deterministic). One hash shuffle
    * on the key + a per-key sort (two window passes over the same
    * ordering — Spark plans them in a single Window exec chain, no
    * second exchange); the hot-key caveat of [[asofJoin]] applies.
    */
  def sessionize(events: DataFrame, key: Column, time: Column,
      tiebreak: Column, maxGap: Long): DataFrame = {
    val reserved = Seq("__k", "__t", "__new", "session_no")
    require(!events.columns.exists(reserved.contains),
      s"sessionize reserves the ${reserved.mkString("/")} column names")
    val base = events.withColumn("__k", key).withColumn("__t", time)
    val w = Window.partitionBy(col("__k")).orderBy(col("__t"), tiebreak)
    base
      .withColumn("__new", when(lag(col("__t"), 1).over(w).isNull ||
        col("__t") - lag(col("__t"), 1).over(w) > maxGap, 1L).otherwise(0L))
      .withColumn("session_no", sum(col("__new"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__k", "__t", "__new")
  }

  /** Interval (range) join: every (point, interval) pair with
    * `start <= point < end`, as an EQUI-join — Spark plans a raw
    * inequality join as a broadcast nested loop (quadratic at corpus
    * scale); here each interval is exploded onto the fixed-width time
    * buckets it covers and points join on their single containing
    * bucket, so the join is a hash shuffle on the bucket id and the
    * exact containment check is a residual filter. An interval of
    * length L costs ceil(L/bucketWidth)+1 replicas — pick bucketWidth
    * near the typical interval length; a point matches each interval
    * in exactly one bucket (its own), so no pair dedup is needed.
    * Times are plain longs (epoch micros in q61); callers convert.
    * Empty intervals (end <= start) match nothing and are dropped up
    * front. Column names: a name shared by both inputs survives into
    * the joined output twice (ambiguous downstream) — rename before
    * joining, as q61 does; `__b`/`__p`/`__start`/`__end` are reserved.
    */
  def rangeJoinBucketed(points: DataFrame, pTime: Column,
      intervals: DataFrame, iStart: Column, iEnd: Column,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val reserved = Seq("__b", "__p", "__start", "__end")
    require(!(points.columns ++ intervals.columns).exists(reserved.contains),
      s"rangeJoinBucketed reserves the ${reserved.mkString("/")} column names")
    val ivals = intervals
      .withColumn("__start", iStart).withColumn("__end", iEnd)
      .filter(col("__end") > col("__start"))
      // end is EXCLUSIVE: the top bucket is the one containing end-1
      // (floor(end/width) would ship a spare replica that the residual
      // filter always rejects when end lands on a bucket boundary)
      .withColumn("__b", explode_outer(sequence(
        floor(col("__start") / bucketWidth),
        floor((col("__end") - 1) / bucketWidth))))
    points.withColumn("__p", pTime)
      .withColumn("__b", floor(col("__p") / bucketWidth))
      .join(ivals, Seq("__b"))
      .filter(col("__p") >= col("__start") && col("__p") < col("__end"))
      .drop("__b", "__p", "__start", "__end")
  }
}
