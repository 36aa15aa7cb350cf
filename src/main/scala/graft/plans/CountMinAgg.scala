package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min Sketch (Cormode & Muthukrishnan 2005) as a
  * TypedImperativeAggregate: `depth` rows of `width` counters; each item
  * increments one counter per row, the point estimate is the MINIMUM of
  * an item's counters — never an undercount, over by at most
  * εN = (e/width)·N with probability 1 − (1/2)^depth.
  *
  * The buffer is a FIXED 8·depth·width-byte array regardless of input
  * size (vs Misra–Gries's bounded-but-variable counter table): partials
  * merge by elementwise ADD (the sketch is a linear transform of the
  * count vector — Agarwal et al., "Mergeable Summaries", PODS 2012), so
  * a 100 TB token stream ships one ~32 KB sketch per partition through
  * map-side combine, and sketches of disjoint corpora compose by
  * addition without rescanning either side.
  *
  * Bucket choice is DETERMINISTIC and engine-portable (the q123/q126
  * sketch-calibration discipline): row j buckets item x at
  * (h131(x) + j·h137(x)) mod width — Kirsch–Mitzenmacher double hashing
  * over the house char-fold [[PolyHash]] pair (bases 131/137, the q54
  * SimHash constants), so DuckDB replays every cell value-for-value and
  * the q144 oracle can reconstruct the whole sketch in SQL.
  *
  * eval returns a struct: `cells` (row-major depth×width counters) and
  * `n` (non-null rows seen) — callers collect the fixed-size sketch
  * (metadata-scale, the q98 Bloom-collect class) and fold the min-of-
  * rows estimate as plain codegen arithmetic.
  */
case class CountMinAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CountMinAgg.Buffer] {

  require(depth > 0 && width > 0, s"bad sketch shape: $depth x $width")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("cells", ArrayType(LongType, containsNull = false),
      nullable = false),
    StructField("n", LongType, nullable = false)))
  override def prettyName: String = "graft_count_min"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING item column, got ${child.dataType.sql}")

  override def createAggregationBuffer(): CountMinAgg.Buffer =
    new CountMinAgg.Buffer(new Array[Long](depth * width), 0L)

  override def update(
      buf: CountMinAgg.Buffer, input: InternalRow): CountMinAgg.Buffer = {
    val v = child.eval(input)
    if (v != null) {
      buf.n += 1L
      val s = v.asInstanceOf[UTF8String].toString
      // the exact PolyHash fold, both bases in one char pass
      var h1 = 0L; var h2 = 0L; var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        h1 = (h1 * 131 + c) % CountMinAgg.Mod
        h2 = (h2 * 137 + c) % CountMinAgg.Mod
        i += 1
      }
      var j = 0
      while (j < depth) {
        buf.cells(j * width + ((h1 + j * h2) % width).toInt) += 1L
        j += 1
      }
    }
    buf
  }

  override def merge(
      buf: CountMinAgg.Buffer, other: CountMinAgg.Buffer): CountMinAgg.Buffer = {
    var i = 0
    while (i < buf.cells.length) { buf.cells(i) += other.cells(i); i += 1 }
    buf.n += other.n
    buf
  }

  override def eval(buf: CountMinAgg.Buffer): Any =
    InternalRow(new GenericArrayData(buf.cells), buf.n)

  override def serialize(buf: CountMinAgg.Buffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 8 * buf.cells.length)
    bb.putLong(buf.n)
    buf.cells.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CountMinAgg.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getLong
    val cells = new Array[Long](depth * width)
    var i = 0
    while (i < cells.length) { cells(i) = bb.getLong; i += 1 }
    new CountMinAgg.Buffer(cells, n)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinAgg =
    copy(child = newChildren(0))
}

object CountMinAgg {
  private[plans] val Mod = 2147483647L // PolyHash's default modulus

  /** Mutable CMS state: row-major depth×width counters + row tally. */
  final class Buffer(val cells: Array[Long], var n: Long)

  def count_min(item: Column, depth: Int, width: Int): Column =
    toColumn(CountMinAgg(toExpression(item), depth, width)
      .toAggregateExpression())
}
