package graft.analysis

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.graftbridge.Bridge.{ADT => AbstractDataType}
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: per group, the ids of the `k` rows with the
  * highest `quality` (ties broken by LOWER id — the same deterministic
  * keeper rule as every dedup here), as a sorted array<long>.
  *
  * This exists because the obvious encodings of "top N per key" both
  * break at corpus scale: a `row_number() over (partition by key)`
  * window ships EVERY member of a mega-key to one reducer before
  * discarding all but N (the scale-killer class `TextOps.dedupExact`
  * documents), and `slice(array_sort(collect_list(...)))` is no better
  * — `collect_list`'s partial state is unbounded, so the map-side
  * "partial" aggregation still accumulates the whole key. This
  * aggregate's state is a bounded heap of (quality, id) pairs capped at
  * `k` in `update` AND `merge`, so a 10^8-row key costs each map task
  * at most k*16 bytes of state and the final merge at most
  * tasks*k entries — true partial aggregation with a hard bound, which
  * is what lets [[TextOps.sourceQuota]] promise a mega-source never
  * concentrates on one task.
  *
  * Rows with a null OR NaN quality, or a null id, are skipped (keeper
  * candidates must be rankable; the SQL-oracle equivalent is a NOT
  * NULL, non-NaN quality key — engines disagree on NaN ordering, and a
  * NaN inside the heap would break the comparison contract). An integral
  * quality key wider than 2^53 loses low bits in the double coercion —
  * pre-scale such keys (a genuine quality score never needs 53 bits).
  *
  * TypedImperativeAggregate (not a DeclarativeAggregate) is the right
  * tool: the buffer is an object heap, planned into
  * ObjectHashAggregateExec with map-side partial aggregation —
  * aggregates never whole-stage-codegen, so there is no doGenCode twin
  * to keep (unlike the fused scalar expressions).
  */
case class BoundedTopKAgg(
    quality: Expression,
    id: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedTopKAgg.Heap]
  with ImplicitCastInputTypes {

  require(k > 0, s"bounded top-k needs k > 0, got $k")

  override def children: Seq[Expression] = Seq(quality, id)
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType, LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bounded_top_k"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(quality = newChildren(0), id = newChildren(1))

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)

  override def createAggregationBuffer(): BoundedTopKAgg.Heap =
    new BoundedTopKAgg.Heap(k)

  override def update(buf: BoundedTopKAgg.Heap, input: InternalRow): BoundedTopKAgg.Heap = {
    val q = quality.eval(input)
    val i = id.eval(input)
    // NaN quality is skipped like null (not merely documented-disallowed):
    // a NaN makes every worse() comparison false, silently corrupting the
    // heap invariant, and rankedIds' sortWith could then throw
    // "Comparison method violates its general contract" at eval time
    if (q != null && i != null && !q.asInstanceOf[Double].isNaN) {
      buf.offer(q.asInstanceOf[Double], i.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: BoundedTopKAgg.Heap, other: BoundedTopKAgg.Heap): BoundedTopKAgg.Heap = {
    other.foreach((q, i) => buf.offer(q, i))
    buf
  }

  /** Kept ids ordered by (quality desc, id asc) — the keeper rank. */
  override def eval(buf: BoundedTopKAgg.Heap): Any =
    new GenericArrayData(buf.rankedIds())

  override def serialize(buf: BoundedTopKAgg.Heap): Array[Byte] = {
    val bytes = new ByteArrayOutputStream(8 + 16 * buf.size)
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    buf.foreach { (q, i) => out.writeDouble(q); out.writeLong(i) }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BoundedTopKAgg.Heap = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new BoundedTopKAgg.Heap(k)
    var j = 0
    while (j < n) { buf.offer(in.readDouble(), in.readLong()); j += 1 }
    buf
  }
}

object BoundedTopKAgg {

  /** Bounded binary min-heap-of-the-kept: the root is the WORST kept
    * entry (lowest quality, then highest id), so an `offer` beyond
    * capacity is an O(log k) replace-root — never more than k entries
    * live, in `update` or `merge`. Plain parallel arrays (no boxing,
    * no tuple allocation per row).
    */
  final class Heap(k: Int) {
    // grow-on-demand up to k: a large k (a "no quota, rank everything"
    // caller) must not eagerly allocate k slots per aggregation buffer
    // — Int.MaxValue would exceed the JVM array limit before a single
    // row arrived. Occupancy, not capacity, is what k bounds.
    private var qs = new Array[Double](math.min(k, 16))
    private var ids = new Array[Long](math.min(k, 16))
    private var n = 0

    def size: Int = n

    /** a strictly worse than b (eviction order)? */
    private def worse(qa: Double, ia: Long, qb: Double, ib: Long): Boolean =
      qa < qb || (qa == qb && ia > ib)

    def offer(q: Double, id: Long): Unit = {
      if (n < k) {
        if (n == qs.length) {
          val cap = math.min(k.toLong, qs.length * 2L).toInt
          qs = java.util.Arrays.copyOf(qs, cap)
          ids = java.util.Arrays.copyOf(ids, cap)
        }
        qs(n) = q; ids(n) = id; n += 1
        siftUp(n - 1)
      } else if (worse(qs(0), ids(0), q, id)) {
        qs(0) = q; ids(0) = id
        siftDown(0)
      }
    }

    private def siftUp(start: Int): Unit = {
      var c = start
      while (c > 0) {
        val p = (c - 1) / 2
        if (worse(qs(c), ids(c), qs(p), ids(p))) { swap(c, p); c = p }
        else return
      }
    }

    private def siftDown(start: Int): Unit = {
      var p = start
      while (true) {
        val l = 2 * p + 1
        val r = l + 1
        var m = p
        if (l < n && worse(qs(l), ids(l), qs(m), ids(m))) m = l
        if (r < n && worse(qs(r), ids(r), qs(m), ids(m))) m = r
        if (m == p) return
        swap(p, m); p = m
      }
    }

    private def swap(a: Int, b: Int): Unit = {
      val q = qs(a); qs(a) = qs(b); qs(b) = q
      val i = ids(a); ids(a) = ids(b); ids(b) = i
    }

    def foreach(f: (Double, Long) => Unit): Unit = {
      var j = 0
      while (j < n) { f(qs(j), ids(j)); j += 1 }
    }

    /** ids sorted best-first: (quality desc, id asc). */
    def rankedIds(): Array[Long] = {
      val idx = Array.range(0, n).sortWith { (a, b) =>
        qs(a) > qs(b) || (qs(a) == qs(b) && ids(a) < ids(b))
      }
      idx.map(ids(_))
    }
  }
}

/** Weight-BUDGET top aggregate: per group, the ids of the best rows by
  * (quality desc, id asc) whose RUNNING weight total stays within
  * `budget` — the "keep docs per source until a token budget" quota
  * real release pipelines apply when sources are balanced by volume,
  * not document count. The keeper rule is the greedy prefix:
  * a row is kept iff `sum(weight) OVER (ORDER BY quality DESC, id
  * ROWS UNBOUNDED PRECEDING) <= budget` — exactly window-expressible,
  * so the whole operator is SQL-oracle-checkable, but never planned as
  * a window (same scale argument as [[BoundedTopKAgg]]).
  *
  * The state bound: because weights are strictly positive, the running
  * total is monotone in rank, so the kept set is a PREFIX of the
  * ranking and the buffer holds exactly that prefix — capped by
  * budget/min(weight) entries in `update` AND `merge`. Pruning is
  * safe under merge: a row evicted from (or rejected by) a partial
  * buffer has prefix-weight > budget over a SUBSET of the group's
  * rows, and more rows only grow that prefix — it can never re-enter.
  *
  * Rows with null/NaN quality, null id, or null/NaN/non-positive
  * weight are skipped (a zero-weight row would make the prefix — and
  * the state — unbounded; the SQL-oracle equivalent is a
  * `weight > 0` predicate).
  */
case class BoundedBudgetTopAgg(
    quality: Expression,
    id: Expression,
    weight: Expression,
    budget: Double,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedBudgetTopAgg.Prefix]
  with ImplicitCastInputTypes {

  require(budget > 0 && !budget.isNaN,
    s"bounded budget top needs budget > 0, got $budget")

  override def children: Seq[Expression] = Seq(quality, id, weight)
  override def inputTypes: Seq[AbstractDataType] =
    Seq(DoubleType, LongType, DoubleType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bounded_budget_top"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(quality = newChildren(0), id = newChildren(1),
      weight = newChildren(2))

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)

  override def createAggregationBuffer(): BoundedBudgetTopAgg.Prefix =
    new BoundedBudgetTopAgg.Prefix(budget)

  override def update(buf: BoundedBudgetTopAgg.Prefix,
      input: InternalRow): BoundedBudgetTopAgg.Prefix = {
    val q = quality.eval(input)
    val i = id.eval(input)
    val w = weight.eval(input)
    if (q != null && i != null && w != null &&
      !q.asInstanceOf[Double].isNaN) {
      val wd = w.asInstanceOf[Double]
      if (wd > 0 && !wd.isNaN) {
        buf.offer(q.asInstanceOf[Double], i.asInstanceOf[Long], wd)
      }
    }
    buf
  }

  override def merge(buf: BoundedBudgetTopAgg.Prefix,
      other: BoundedBudgetTopAgg.Prefix): BoundedBudgetTopAgg.Prefix = {
    buf.absorb(other)
    buf
  }

  /** Kept ids ordered by (quality desc, id asc) — already the buffer
    * order, the prefix invariant.
    */
  override def eval(buf: BoundedBudgetTopAgg.Prefix): Any =
    new GenericArrayData(buf.ids())

  override def serialize(buf: BoundedBudgetTopAgg.Prefix): Array[Byte] = {
    val bytes = new ByteArrayOutputStream(32 + 24 * buf.size)
    val out = new DataOutputStream(bytes)
    buf.writeTo(out)
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BoundedBudgetTopAgg.Prefix =
    BoundedBudgetTopAgg.readFrom(
      new DataInputStream(new ByteArrayInputStream(bytes)), budget)
}

object BoundedBudgetTopAgg {

  /** The greedy budget prefix, kept SORTED best-first by
    * (quality desc, id asc) in parallel arrays, PLUS the "barrier" —
    * the best-ranked row known to have overflowed the budget. The
    * barrier is what makes pruning exact: the keeper rule's running
    * total counts EVERY better row, kept or dropped, so a state that
    * forgot its dropped rows would wrongly re-admit a light row
    * arriving after a heavy better row was evicted (budget 10: accept
    * E(q=6,w=9), evict D(q=5,w=9), then F(q=4,w=1) must be REJECTED —
    * its true prefix is 9+9+1=19). Invariants, arrival-order
    * independent and preserved by merge (a unit test exercises the
    * D/E/F case across merge orders):
    *
    *  - the arrays hold exactly the kept prefix of all rows offered
    *    so far; `total` is its weight;
    *  - `barrier` is the best (quality desc, id asc) row offered so
    *    far that is NOT in the prefix (none yet = no barrier). Every
    *    dropped row is worse than or equal to it, so any new row at
    *    or below the barrier's rank has true prefix weight
    *    > budget and is rejected outright; any new row ABOVE it has
    *    its full true better-set in the arrays, so the prefix-sum
    *    test is exact.
    *
    * An `offer` binary-searches the rank position, rejects at/below
    * the barrier, rejects (and becomes the new barrier) if the prefix
    * weight through its position would exceed the budget, else
    * inserts and evicts the tail back under budget (the best evictee
    * becomes the new barrier). So the arrays never hold anything
    * beyond the budget's own prefix — the `update`/`merge` state
    * bound. Insertion is O(size) for the arraycopy; size is
    * budget-bounded and small in practice (a quota exists to be far
    * smaller than the group). Weight sums are exact for
    * integer-valued weights (token/char counts, the intended keys)
    * up to 2^53; fractional weights get IEEE addition in rank order,
    * the same arithmetic as the oracle's window sum.
    */
  final class Prefix(budget: Double) {
    private var qs = new Array[Double](16)
    private var idv = new Array[Long](16)
    private var ws = new Array[Double](16)
    private var n = 0
    private var total = 0.0
    private var hasBar = false
    private var barQ = 0.0
    private var barId = 0L

    def size: Int = n
    private[graft] def barrier: Option[(Double, Long)] =
      if (hasBar) Some((barQ, barId)) else None

    private def better(qa: Double, ia: Long, qb: Double, ib: Long): Boolean =
      qa > qb || (qa == qb && ia < ib)

    /** rank position of (q, id): first index holding a WORSE entry. */
    private def rankPos(q: Double, id: Long): Int = {
      var lo = 0
      var hi = n
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (better(qs(mid), idv(mid), q, id)) lo = mid + 1
        else hi = mid
      }
      lo
    }

    /** Record a known-overflowed row, and evict every kept entry at or
      * below it — their running totals include everything through the
      * barrier row, already over budget. The trim lives HERE (not at
      * the call sites) so every path that learns of a dropped row —
      * overflow rejection, tail eviction, absorbing another buffer's
      * barrier — restores the invariant identically.
      */
    private[analysis] def raiseBarrier(q: Double, id: Long): Unit =
      if (!hasBar || better(q, id, barQ, barId)) {
        hasBar = true; barQ = q; barId = id
        while (n > 0 && !better(qs(n - 1), idv(n - 1), barQ, barId)) {
          n -= 1; total -= ws(n)
        }
      }

    def offer(q: Double, id: Long, w: Double): Unit = {
      // at/below the barrier: true prefix already over budget
      if (hasBar && !better(q, id, barQ, barId)) return
      val pos = rankPos(q, id)
      var prefix = 0.0
      var j = 0
      while (j < pos) { prefix += ws(j); j += 1 }
      if (prefix + w > budget) {
        // the row overflows at rank `pos` — and so does every kept
        // entry worse than it; raiseBarrier evicts them (the
        // merge-order counterexamples in the class doc, caught by the
        // permutation test)
        raiseBarrier(q, id)
        return
      }
      if (n == qs.length) {
        val cap = qs.length * 2
        qs = java.util.Arrays.copyOf(qs, cap)
        idv = java.util.Arrays.copyOf(idv, cap)
        ws = java.util.Arrays.copyOf(ws, cap)
      }
      System.arraycopy(qs, pos, qs, pos + 1, n - pos)
      System.arraycopy(idv, pos, idv, pos + 1, n - pos)
      System.arraycopy(ws, pos, ws, pos + 1, n - pos)
      qs(pos) = q; idv(pos) = id; ws(pos) = w
      n += 1
      total += w
      // evict from the worst end until the whole prefix fits again;
      // the BEST evictee (the last index to go) is the new barrier
      val evictedAny = total > budget
      while (total > budget) { n -= 1; total -= ws(n) }
      if (evictedAny) raiseBarrier(qs(n), idv(n))
    }

    /** Fold the other buffer in: barrier first (its dropped-row
      * knowledge), then its kept prefix, best-first.
      */
    private[graft] def absorb(other: Prefix): Unit = {
      if (other.hasBar) raiseBarrier(other.barQ, other.barId)
      other.foreach((q, i, w) => offer(q, i, w))
    }

    def foreach(f: (Double, Long, Double) => Unit): Unit = {
      var j = 0
      while (j < n) { f(qs(j), idv(j), ws(j)); j += 1 }
    }

    private[analysis] def writeTo(out: DataOutputStream): Unit = {
      out.writeBoolean(hasBar)
      if (hasBar) { out.writeDouble(barQ); out.writeLong(barId) }
      out.writeInt(n)
      foreach { (q, i, w) =>
        out.writeDouble(q); out.writeLong(i); out.writeDouble(w)
      }
    }

    /** Kept ids, already (quality desc, id asc)-sorted. */
    def ids(): Array[Long] = java.util.Arrays.copyOf(idv, n)
  }

  private[analysis] def readFrom(in: DataInputStream,
      budget: Double): Prefix = {
    val buf = new Prefix(budget)
    if (in.readBoolean()) buf.raiseBarrier(in.readDouble(), in.readLong())
    val n = in.readInt()
    var j = 0
    while (j < n) {
      buf.offer(in.readDouble(), in.readLong(), in.readDouble()); j += 1
    }
    buf
  }
}

/** Column-API entry point. */
object BoundedTopK {
  /** Top-`k` ids per group by (quality desc, id asc), as array<long>.
    * quality/id coerce via implicit cast (int -> double, int -> long).
    */
  def of(quality: Column, id: Column, k: Int): Column =
    Bridge.column(
      BoundedTopKAgg(Bridge.expression(quality.cast("double")),
        Bridge.expression(id.cast("long")), k).toAggregateExpression())

  /** Budget variant: best ids by (quality desc, id asc) while the
    * running `weight` total stays <= `budget` ([[BoundedBudgetTopAgg]]).
    */
  def byBudget(quality: Column, id: Column, weight: Column,
      budget: Double): Column =
    Bridge.column(
      BoundedBudgetTopAgg(Bridge.expression(quality.cast("double")),
        Bridge.expression(id.cast("long")),
        Bridge.expression(weight.cast("double")), budget)
        .toAggregateExpression())
}
