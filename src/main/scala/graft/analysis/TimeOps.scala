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
    * task — the standard window caveat. The house remedy ships with
    * this file: run [[hotKeys]] as the pre-flight audit (the
    * [[Buckets.hotBuckets]] no-silent-caps rule applied to window
    * keys), and when it flags keys, switch to [[asofJoinBucketed]] —
    * the row-identical two-phase form whose per-task partition is
    * (key, time-bucket), never the whole key.
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
    * second exchange); the hot-key caveat of [[asofJoin]] applies —
    * audit with [[hotKeys]], and switch flagged workloads to
    * [[sessionizeBucketed]] (row-identical, (key, time-bucket)
    * partitions).
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

  /** Per-key row-volume audit for the window operators ([[asofJoin]] /
    * [[sessionize]]) — the [[Buckets.hotBuckets]] no-silent-caps rule
    * applied to window partition keys: one row per key whose event
    * count exceeds `maxPerKey` (the volume a single task can sort
    * comfortably), with the bucket count a time-bucketed re-plan would
    * spread it over. Map-side partial count on the key, so the audit
    * itself never concentrates; run and log it wherever one
    * pathological user/device/key could pin a task, and switch flagged
    * workloads to the `*Bucketed` forms.
    */
  def hotKeys(events: DataFrame, key: Column, time: Column,
      maxPerKey: Long, bucketWidth: Long): DataFrame = {
    require(maxPerKey > 0 && bucketWidth > 0,
      s"maxPerKey/bucketWidth must be positive ($maxPerKey/$bucketWidth)")
    events.groupBy(key.as("key"))
      .agg(count(lit(1)).as("n"),
        countDistinct(floor(time / bucketWidth)).as("n_buckets"),
        max(time).as("t_max"), min(time).as("t_min"))
      .filter(col("n") > maxPerKey)
      .select(col("key"), col("n"), col("n_buckets"), col("t_min"), col("t_max"))
  }

  /** [[asofJoin]] with the per-key window split across fixed-width
    * TIME BUCKETS — the hot-key-proof form, row-identical to
    * [[asofJoin]] (a test pins frame equality). Three phases, all
    * keyed by (key, bucket) or the compact per-(key, bucket) summary:
    *
    *  1. the latest right row PER (key, bucket) — one partial-agg
    *     shuffle (`max(struct(time, payload))` is exactly the window's
    *     carry rule: latest time, greatest payload on ties);
    *  2. carry-in per active (key, bucket): a window over the COMPACT
    *     bucket table (one row per key x active bucket — a 10^9-event
    *     key with 10^4 active buckets costs a 10^4-row sort, not a
    *     10^9-row one) takes the latest summary from any EARLIER
    *     bucket;
    *  3. the [[asofJoin]] union + last-non-null window, but
    *     partitioned by (key, bucket) with the carry-in injected as a
    *     synthetic pre-sorted right row (`__side = -1`: an earlier
    *     bucket's time is strictly smaller, the side only documents
    *     intent).
    *
    * Worst-case per task: one bucket of one key — pick `bucketWidth`
    * so the hottest key emits ≤ ~10^6 events per bucket ([[hotKeys]]
    * reports exactly this). Cost over the plain form: one extra
    * partial-agg shuffle and the compact window. Same null semantics
    * as [[asofJoin]] (null-keyed/timed right rows dropped up front;
    * null-keyed/timed left rows survive with a null match — a null
    * time lands in the null bucket, which sorts first and can have no
    * carry-in). `__side`/`__r`/`__b`/`__last` are reserved.
    */
  def asofJoinBucketed(left: DataFrame, right: DataFrame, key: String,
      time: String, asofCol: String = "asof",
      bucketWidth: Long = 86400L * 1000000L): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val reserved = Seq("__side", "__r", "__b", "__last")
    require(!left.columns.exists(reserved.contains),
      s"asofJoinBucketed reserves the ${reserved.mkString("/")} column names")
    val rStruct = struct(right.columns.filterNot(_ == key).map(col): _*)
    val r = right.filter(col(key).isNotNull && col(time).isNotNull)
      .select(col(key), col(time), rStruct.as("__r"))
      .withColumn("__b", floor(col(time) / bucketWidth))
    val rType = r.schema("__r").dataType
    // 1. bucket-local latest right summary (the carry candidate)
    val bucketLast = r.groupBy(col(key), col("__b"))
      .agg(max(struct(col(time), col("__r"))).as("__last"))
    // 2. carry-in per ACTIVE (key, bucket) — active = has left or right
    // rows; the window runs over this compact summary table only
    val lb = left.filter(col(key).isNotNull)
      .select(col(key), floor(col(time) / bucketWidth).as("__b"))
    // one distinct over the whole union — a pre-distinct of the left
    // side alone would be swallowed by the outer one anyway (it was,
    // until r08: one redundant exchange)
    val active = lb
      .unionByName(bucketLast.select(col(key), col("__b"))).distinct()
    val wc = Window.partitionBy(col(key)).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = active.join(bucketLast, Seq(key, "__b"), "left")
      .withColumn("__last", last(col("__last"), ignoreNulls = true).over(wc))
      .filter(col("__last").isNotNull)
    // 3. per-(key, bucket) union window: carry-in + in-bucket right +
    // left, ordered like asofJoin (carry time is strictly earlier than
    // every in-bucket time, so __side = -1 is documentation, not a tie
    // rule)
    val l = left.withColumn("__b", floor(col(time) / bucketWidth))
      .withColumn("__side", lit(1))
      .withColumn("__r", lit(null).cast(rType))
    def shape(df: DataFrame): DataFrame = df.select(l.columns.map {
      case c if c == key || c == time || c == "__b" || c == "__side" || c == "__r" => col(c)
      case c => lit(null).cast(left.schema(c).dataType).as(c)
    }: _*)
    val u = shape(r.withColumn("__side", lit(0)))
      .unionByName(shape(carry.select(col(key), col("__b"),
        col("__last")(time).as(time), lit(-1).as("__side"),
        col("__last")("__r").as("__r"))))
      .unionByName(l)
    val w = Window.partitionBy(col(key), col("__b"))
      .orderBy(col(time), col("__side"), col("__r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn(asofCol, last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__side", "__r", "__b")
  }

  /** [[sessionize]] with the per-key sort split across fixed-width
    * TIME BUCKETS — row-identical to [[sessionize]] (a test pins frame
    * equality) with no task ever holding more than one key-bucket:
    *
    *  1. per-event LOCAL break flags inside (key, bucket) windows (a
    *     bucket's first event is deferred to phase 2 — its previous
    *     event lives in an earlier bucket);
    *  2. a COMPACT per-(key, bucket) table (first/last event time,
    *     local break count) walked by a per-key window: whether each
    *     bucket's first event opens a session (gap from the previous
    *     ACTIVE bucket's last event — empty buckets between active
    *     ones contribute silence, not rows) and the session count
    *     carried in from all earlier buckets;
    *  3. session_no = carried-in count + running local breaks —
    *     identical to the single-window numbering.
    *
    * Same hot-key arithmetic as [[asofJoinBucketed]]; `maxGap` and
    * `bucketWidth` are independent (a session may span many buckets).
    * Reserves `__k`/`__t`/`__b`/`__new`/`__first`/`__base`/
    * `session_no`.
    */
  def sessionizeBucketed(events: DataFrame, key: Column, time: Column,
      tiebreak: Column, maxGap: Long,
      bucketWidth: Long = 86400L * 1000000L): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val reserved = Seq("__k", "__t", "__b", "__new", "__first", "__base",
      "__rn", "__lt", "__wk", "__wb", "session_no")
    require(!events.columns.exists(reserved.contains),
      s"sessionizeBucketed reserves the ${reserved.mkString("/")} column names")
    val base = events.withColumn("__k", key).withColumn("__t", time)
      .withColumn("__b", floor(col("__t") / bucketWidth))
    val wb = Window.partitionBy(col("__k"), col("__b"))
      .orderBy(col("__t"), tiebreak)
    // 1. local breaks — only the bucket's FIRST event (row_number 1) is
    // deferred to the compact walk; any later row mirrors the plain
    // form's rule exactly, including the null-TIME edge (a null lag
    // VALUE opens a session in [[sessionize]], distinct from "no
    // previous row" — row_number is what tells them apart)
    val local = base
      .withColumn("__rn", row_number().over(wb))
      .withColumn("__lt", lag(col("__t"), 1).over(wb))
      .withColumn("__new",
        when(col("__rn") > 1 &&
          (col("__lt").isNull || col("__t") - col("__lt") > maxGap), 1L)
          .otherwise(0L))
      .drop("__rn", "__lt")
    // 2. compact per-(key, bucket) walk. ONE aggregation over `local`
    // supplies both the bucket time bounds and the local break count —
    // `local` holds exactly `base`'s rows, so min/max(__t) here equal
    // the old separate stats-over-base aggregation, and folding them
    // together removes a full events re-scan plus the null-safe
    // stats-to-breaks join (two exchanges) the two-frame form needed
    // (r08: three 1-task scans of the events parquet -> two).
    val walkedStats = local.groupBy(col("__k"), col("__b"))
      .agg(min(col("__t")).as("__t_min"), max(col("__t")).as("__t_max"),
        sum(col("__new")).as("__n_local"))
    val wk = Window.partitionBy(col("__k")).orderBy(col("__b"))
    val walked = walkedStats
      .withColumn("__prev_last", lag(col("__t_max"), 1).over(wk))
      .withColumn("__first",
        when(col("__prev_last").isNull ||
          col("__t_min") - col("__prev_last") > maxGap, 1L).otherwise(0L))
      // sessions opened before this bucket's first event
      .withColumn("__base",
        coalesce(sum(col("__first") + col("__n_local"))
          .over(wk.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__k"), col("__b"), col("__first"), col("__base"))
    // 3. final numbering: base + first-event flag + running local breaks
    // AFTER the first event (the first event's own __new is 0 by
    // construction, so the running sum over all rows is exact).
    // Null-SAFE join: a null key (one partition in the plain form) or
    // the null time bucket must survive — an equi-join would drop them
    val walkedR = walked.select(col("__k").as("__wk"), col("__b").as("__wb"),
      col("__first"), col("__base"))
    val joined = local.join(walkedR,
      col("__k") <=> col("__wk") && col("__b") <=> col("__wb"))
      .drop("__wk", "__wb")
    joined
      .withColumn("session_no", col("__base") + col("__first") +
        sum(col("__new")).over(wb.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .drop("__k", "__t", "__b", "__new", "__first", "__base")
  }
}
