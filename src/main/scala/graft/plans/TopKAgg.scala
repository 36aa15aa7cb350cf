package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
import org.apache.spark.sql.types._

/** Bounded top-k per group as ONE mergeable aggregate (q99).
  *
  * Spark's idiomatic top-k-per-group (q25) is
  * `row_number() OVER (PARTITION BY g ORDER BY v DESC) <= k` — a
  * Window that shuffles EVERY row of the group and sorts whole
  * partitions. This aggregate keeps a k-element min-heap per group
  * instead: map-side partials ship at most k (value, id) pairs per
  * (partition, group) through the shuffle, and merging two partials is
  * a k-bounded heap union. For top-3-of-millions-per-key at 100 TB the
  * shuffle volume drops from O(rows) to O(groups · k).
  *
  * Ordering is total and deterministic: by value DESC, then id ASC as
  * the tiebreak — `eval` emits the final array strongest-first, so
  * `posexplode` yields the dense rank directly. Values are only
  * COMPARED, never combined, so float nondeterminism cannot arise.
  *
  * `distinctIds = true` (q163): the input stream may repeat an id
  * within a group — an LSH candidate pair surfaces once per colliding
  * band — under the CONTRACT that the value is a pure function of the
  * id inside its group (a cosine recomputed per occurrence from the
  * same two vectors). Each repeat would otherwise occupy its own heap
  * slot and crowd out true neighbors, so `offer` first scans the ≤ k
  * live entries for the id (k is small by construction; the scan is
  * cheaper than any hash set at k ≤ 5) and drops known ids. The dedup
  * is EXACT without remembering evictions: an id is evicted only while
  * it is the heap root, i.e. strictly weakest of the k live entries
  * (ties split by id, so the order is strict across distinct ids), and
  * entries only ever get stronger — a re-arrival of an evicted id
  * compares weaker than the current root and is rejected by the
  * ordinary `offer` path. This replaces the
  * `.distinct()` + row_number window over the candidate stream, whose
  * two full shuffles of O(candidates) rows are exactly what aborted the
  * 200k-vector probe on spill: here duplicates die in the map-side
  * partial and the shuffle carries ≤ k entries per (partition, group).
  */
case class TopKAgg(
    value: Expression, id: Expression, k: Int,
    distinctIds: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKAgg.Heap] {

  require(k > 0, s"k must be positive, got $k")

  override def children: Seq[Expression] = Seq(value, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("value", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_topk"

  // without this, a DECIMAL/STRING value column through the registered
  // SQL surface passes analysis and then ClassCastExceptions mid-job
  // (Spark's Decimal is not a java.lang.Number)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (value.dataType == DoubleType && id.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (DOUBLE value, BIGINT id), got " +
        s"(${value.dataType.sql}, ${id.dataType.sql})")

  override def createAggregationBuffer(): TopKAgg.Heap = new TopKAgg.Heap(k)

  override def update(buf: TopKAgg.Heap, input: InternalRow): TopKAgg.Heap = {
    val v = value.eval(input)
    val i = id.eval(input)
    if (v != null && i != null) {
      val vd = v.asInstanceOf[Number].doubleValue()
      val il = i.asInstanceOf[Number].longValue()
      if (!(distinctIds && buf.containsId(il))) buf.offer(vd, il)
    }
    buf
  }

  override def merge(buf: TopKAgg.Heap, other: TopKAgg.Heap): TopKAgg.Heap = {
    other.foreach { (v, i) =>
      if (!(distinctIds && buf.containsId(i))) buf.offer(v, i)
    }
    buf
  }

  override def eval(buf: TopKAgg.Heap): Any = {
    val arr = buf.sortedDesc()
    new GenericArrayData(arr.map { case (v, i) =>
      InternalRow(v, i): Any
    })
  }

  override def serialize(buf: TopKAgg.Heap): Array[Byte] = {
    val entries = buf.entries
    val bb = ByteBuffer.allocate(4 + entries.length * 16)
    bb.putInt(entries.length)
    entries.foreach { case (v, i) => bb.putDouble(v); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKAgg.Heap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = new TopKAgg.Heap(k)
    var j = 0
    while (j < n) { h.offer(bb.getDouble, bb.getLong); j += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(value = newChildren(0), id = newChildren(1))
}

object TopKAgg {

  /** Fixed-capacity binary min-heap over (value, id) with the WEAKEST
    * element (smallest value, largest id) at the root, so a stronger
    * arrival displaces it in O(log k). Total order: (v1, i1) beats
    * (v2, i2) iff v1 > v2, or v1 == v2 && i1 < i2. */
  final class Heap(k: Int) {
    private val vs = new Array[Double](k)
    private val ids = new Array[Long](k)
    private var n = 0

    /** true if (v1,i1) is WEAKER than (v2,i2) under the top-k order.
      * Double.compare gives the TOTAL order (NaN greater than every
      * double, matching both Spark's sort order and the DuckDB
      * oracle's ORDER BY v DESC) — raw </== would silently corrupt the
      * heap on NaN input. */
    @inline private def weaker(v1: Double, i1: Long, v2: Double, i2: Long) = {
      val c = java.lang.Double.compare(v1, v2)
      c < 0 || (c == 0 && i1 > i2)
    }

    def offer(v: Double, i: Long): Unit = {
      if (n < k) {
        vs(n) = v; ids(n) = i; n += 1
        var c = n - 1 // sift up
        while (c > 0 && weaker(vs(c), ids(c), vs((c - 1) / 2), ids((c - 1) / 2))) {
          swap(c, (c - 1) / 2); c = (c - 1) / 2
        }
      } else if (weaker(vs(0), ids(0), v, i)) {
        vs(0) = v; ids(0) = i
        var c = 0 // sift down
        while (true) {
          var w = c
          val l = 2 * c + 1; val r = 2 * c + 2
          if (l < n && weaker(vs(l), ids(l), vs(w), ids(w))) w = l
          if (r < n && weaker(vs(r), ids(r), vs(w), ids(w))) w = r
          if (w == c) return
          swap(c, w); c = w
        }
      }
    }

    @inline private def swap(a: Int, b: Int): Unit = {
      val tv = vs(a); vs(a) = vs(b); vs(b) = tv
      val ti = ids(a); ids(a) = ids(b); ids(b) = ti
    }

    def foreach(f: (Double, Long) => Unit): Unit = {
      var j = 0
      while (j < n) { f(vs(j), ids(j)); j += 1 }
    }

    def entries: Array[(Double, Long)] =
      Array.tabulate(n)(j => (vs(j), ids(j)))

    /** Linear scan of the ≤ k live entries (distinctIds dedup). */
    def containsId(i: Long): Boolean = {
      var j = 0
      while (j < n) { if (ids(j) == i) return true; j += 1 }
      false
    }

    /** Contents strongest-first: value DESC, id ASC. */
    def sortedDesc(): Array[(Double, Long)] =
      entries.sortWith { case ((v1, i1), (v2, i2)) => weaker(v2, i2, v1, i1) }
  }

  def topk_agg(value: Column, id: Column, k: Int): Column =
    toColumn(TopKAgg(toExpression(value), toExpression(id), k)
      .toAggregateExpression())

  /** Top-k with per-group id dedup — for candidate streams where the
    * same (group, id) pair recurs with an identical value (multi-band
    * LSH collisions). See the distinctIds paragraph on [[TopKAgg]]. */
  def topk_distinct_agg(value: Column, id: Column, k: Int): Column =
    toColumn(TopKAgg(toExpression(value), toExpression(id), k,
      distinctIds = true).toAggregateExpression())
}
