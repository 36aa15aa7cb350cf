package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
import org.apache.spark.sql.types._

/** SimHash as a TypedImperativeAggregate: accumulates the 60 weighted
  * bit-votes of a document in one mutable long[60] buffer.
  *
  * Replaces the declarative explode(×60 bits) → groupBy(doc, bit) →
  * re-group formulation — that shape shuffles 60× the rows and
  * aggregates twice; this buffer aggregates once, with partial (map-side)
  * combine shipping a single 480-byte buffer per (partition, doc).
  * Semantics are identical: bit b of the result is set iff
  * Σ cnt·(±1 per word's bit b) > 0, with word bits 0..29 from `h1` and
  * 30..59 from `h2` (the two char-poly hashes). */
case class SimHashAgg(
    h1: Expression, h2: Expression, cnt: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(h1, h2, cnt)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](60)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val a = h1.eval(input)
    val b = h2.eval(input)
    val c = cnt.eval(input)
    if (a != null && b != null && c != null) {
      val v1 = a.asInstanceOf[Number].longValue()
      val v2 = b.asInstanceOf[Number].longValue()
      val w = c.asInstanceOf[Number].longValue()
      var i = 0
      while (i < 30) {
        buf(i) += (if (((v1 >> i) & 1L) == 1L) w else -w)
        buf(i + 30) += (if (((v2 >> i) & 1L) == 1L) w else -w)
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 60) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    var sh = 0L
    var i = 0
    while (i < 60) { if (buf(i) > 0) sh |= (1L << i); i += 1 }
    sh
  }

  override def serialize(buf: Array[Long]): Array[Byte] =
    LongArrayCodec.ser(buf)

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    LongArrayCodec.deser(bytes, 60)

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SimHashAgg =
    copy(h1 = newChildren(0), h2 = newChildren(1), cnt = newChildren(2))
}

object SimHashAgg {
  def simhash_agg(h1: Column, h2: Column, cnt: Column): Column =
    toColumn(SimHashAgg(toExpression(h1), toExpression(h2),
      toExpression(cnt)).toAggregateExpression())
}
