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

/** Column-API entry point. */
object BoundedTopK {
  /** Top-`k` ids per group by (quality desc, id asc), as array<long>.
    * quality/id coerce via implicit cast (int -> double, int -> long).
    */
  def of(quality: Column, id: Column, k: Int): Column =
    Bridge.column(
      BoundedTopKAgg(Bridge.expression(quality.cast("double")),
        Bridge.expression(id.cast("long")), k).toAggregateExpression())
}
