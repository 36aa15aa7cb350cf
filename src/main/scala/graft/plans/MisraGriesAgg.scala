package graft.plans

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items summary as a TypedImperativeAggregate:
  * the candidate-generation pass of the two-pass exact heavy-hitters
  * operator (q92).
  *
  * Each partition keeps at most `capacity` counters; when a new item
  * arrives with the table full, every counter is decremented (the MG
  * step), evicting items whose counter reaches zero. Partials merge by
  * adding counters and, if the merged table exceeds `capacity`,
  * subtracting the (capacity+1)-th largest counter from all of them
  * (Agarwal et al., "Mergeable Summaries", PODS 2012) — the merged
  * summary keeps the MG guarantee: any item with true frequency
  * > N/(capacity+1) is present in the summary.
  *
  * That guarantee is what makes the TWO-PASS operator exact: pass 1
  * ships one <= capacity-entry map per partition (map-side combine, a
  * few KB regardless of data size), pass 2 re-counts only the
  * candidate set exactly and applies the real threshold t > N/(k+1).
  * At 100 TB this is the only shape that works — a full groupBy on a
  * high-cardinality key would shuffle the whole corpus, while the MG
  * pass shuffles O(partitions · capacity) bytes and the recount pass
  * aggregates only rows matching a broadcast candidate set.
  *
  * eval returns a struct: `cand` (the sorted candidate items) and `n`
  * (the exact number of non-null rows seen) so the caller gets the
  * threshold denominator from the same single pass.
  */
case class MisraGriesAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MisraGriesAgg.Buffer] {

  require(capacity > 0, s"capacity must be positive, got $capacity")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("cand", ArrayType(StringType, containsNull = false),
      nullable = false),
    StructField("n", LongType, nullable = false)))
  override def prettyName: String = "graft_misra_gries"

  // reject non-string items at analysis time rather than letting the
  // registered SQL surface ClassCastException inside the aggregation exec
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING item column, got ${child.dataType.sql}")

  override def createAggregationBuffer(): MisraGriesAgg.Buffer =
    new MisraGriesAgg.Buffer(mutable.HashMap.empty, 0L)

  override def update(
      buf: MisraGriesAgg.Buffer, input: InternalRow): MisraGriesAgg.Buffer = {
    val v = child.eval(input)
    if (v != null) {
      buf.n += 1L
      // UTF8String buffers are reused by the row iterator — copy to an
      // immutable JVM String before keying the map
      val item = v.asInstanceOf[UTF8String].toString
      val m = buf.counters
      m.get(item) match {
        case Some(c) => m.update(item, c + 1L)
        case None if m.size < capacity => m.update(item, 1L)
        case None => // MG step: decrement all, drop zeros
          val dead = mutable.ArrayBuffer.empty[String]
          m.foreach { case (k, c) =>
            if (c == 1L) dead += k else m.update(k, c - 1L)
          }
          dead.foreach(m.remove)
      }
    }
    buf
  }

  override def merge(
      buf: MisraGriesAgg.Buffer,
      other: MisraGriesAgg.Buffer): MisraGriesAgg.Buffer = {
    val m = buf.counters
    other.counters.foreach { case (k, c) =>
      m.update(k, m.getOrElse(k, 0L) + c)
    }
    buf.n += other.n
    if (m.size > capacity) {
      // mergeable-summaries step: subtract the (capacity+1)-th largest
      // counter from everything; >= capacity survivors is impossible
      val cut = m.values.toArray.sorted(Ordering[Long].reverse)(capacity)
      val dead = mutable.ArrayBuffer.empty[String]
      m.foreach { case (k, c) =>
        if (c - cut <= 0L) dead += k else m.update(k, c - cut)
      }
      dead.foreach(m.remove)
    }
    buf
  }

  override def eval(buf: MisraGriesAgg.Buffer): Any = {
    val sorted = buf.counters.keys.toArray.sorted
    InternalRow(
      new GenericArrayData(sorted.map(UTF8String.fromString(_: String))),
      buf.n)
  }

  override def serialize(buf: MisraGriesAgg.Buffer): Array[Byte] = {
    val entries = buf.counters.toArray
    val payload = entries.map { case (k, _) =>
      k.getBytes(StandardCharsets.UTF_8)
    }
    val size = 8 + 4 + payload.map(_.length + 4 + 8).sum
    val bb = ByteBuffer.allocate(size)
    bb.putLong(buf.n)
    bb.putInt(entries.length)
    entries.indices.foreach { i =>
      bb.putInt(payload(i).length)
      bb.put(payload(i))
      bb.putLong(entries(i)._2)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MisraGriesAgg.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getLong
    val sz = bb.getInt
    val m = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < sz) {
      val len = bb.getInt
      val kb = new Array[Byte](len)
      bb.get(kb)
      m.update(new String(kb, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    new MisraGriesAgg.Buffer(m, n)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren(0))
}

object MisraGriesAgg {
  /** Mutable MG state: bounded counter table + exact row tally. */
  final class Buffer(val counters: mutable.HashMap[String, Long], var n: Long)

  def misra_gries(item: Column, capacity: Int): Column =
    toColumn(MisraGriesAgg(toExpression(item), capacity)
      .toAggregateExpression())
}
