package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
import org.apache.spark.sql.types._

/** 32-permutation MinHash signature as one TypedImperativeAggregate:
  * a long[32] running-minimum buffer updated with all 32 affine
  * "permutations" of each shingle hash in a single pass.
  *
  * Replaces 32 separate `min((h*a_i + b_i) % 2^32)` aggregate
  * expressions — one buffer, one codegen'd update loop, map-side
  * combine ships 256 bytes per (partition, doc). The permutation
  * constants match [[graft.operators.LlmQueries.permHash]]'s published
  * values exactly, so signatures are bit-identical to the declarative
  * form and to the DuckDB oracle. */
case class MinHashAgg(
    h: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  import MinHashAgg.NumPerms

  override def children: Seq[Expression] = Seq(h)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(NumPerms)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = h.eval(input)
    if (v != null) {
      val hv = v.asInstanceOf[Number].longValue()
      var i = 0
      while (i < NumPerms) {
        val p = (hv * MinHashAgg.permA(i) + MinHashAgg.permB(i)) %
          MinHashAgg.PermMod
        if (p < buf(i)) buf(i) = p
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < NumPerms) {
      if (other(i) < buf(i)) buf(i) = other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] =
    LongArrayCodec.ser(buf)

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    LongArrayCodec.deser(bytes, NumPerms)

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashAgg =
    copy(h = newChildren(0))
}

object MinHashAgg {
  val NumPerms = 32

  /** The single source of truth for the affine "permutation" constants —
    * referenced by both this aggregate and the declarative
    * LlmQueries.permHash / the DuckDB oracle SQL. */
  val PermMod = 4294967296L
  def permA(i: Int): Long = 1103515245L + 2L * i
  def permB(i: Int): Long = 12345L + 7L * i

  def minhash_agg(h: Column): Column =
    toColumn(MinHashAgg(toExpression(h)).toAggregateExpression())

  def minhash_code(hashes: Column): Column =
    toColumn(MinHashCode(toExpression(hashes)))
}

/** Per-ROW MinHash signature from an array of shingle hashes — the
  * expression twin of [[MinHashAgg]] for contexts where a group-by is
  * unavailable or unwanted: STREAMING ingest (one doc per row, no
  * stateful aggregation, no shuffle) and any narrow map stage. One
  * codegen'd pass over the array updating all 32 running minima —
  * bit-identical to the aggregate for non-empty input (same constants,
  * same fold). Rows whose array is empty or all-null yield the
  * aggregate's untouched-buffer sentinels (Long.MaxValue per slot, a
  * value no real hash can produce — PermMod < 2^33); callers filter
  * shingle-less docs first, exactly as the group-by form drops them by
  * never seeing a row. */
case class MinHashCode(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import MinHashAgg.{NumPerms, PermMod, permA, permB}
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_code"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires ARRAY<BIGINT>, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = a.numElements()
    val mins = Array.fill(NumPerms)(Long.MaxValue)
    var k = 0
    while (k < n) {
      if (!a.isNullAt(k)) {
        val h = a.getLong(k)
        var i = 0
        while (i < NumPerms) {
          val p = (h * permA(i) + permB(i)) % PermMod
          if (p < mins(i)) mins(i) = p
          i += 1
        }
      }
      k += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val k = ctx.freshName("k")
      val i = ctx.freshName("i"); val h = ctx.freshName("h")
      val p = ctx.freshName("p"); val mins = ctx.freshName("mins")
      s"""
         |int $n = $a.numElements();
         |long[] $mins = new long[$NumPerms];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $k = 0; $k < $n; $k++) {
         |  if (!$a.isNullAt($k)) {
         |    long $h = $a.getLong($k);
         |    for (int $i = 0; $i < $NumPerms; $i++) {
         |      long $p = ($h * (1103515245L + 2L * $i) + (12345L + 7L * $i))
         |        % ${PermMod}L;
         |      if ($p < $mins[$i]) $mins[$i] = $p;
         |    }
         |  }
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): MinHashCode =
    copy(child = newChild)
}

/** Shared fixed-width long[] buffer codec for the imperative aggregates. */
private[plans] object LongArrayCodec {
  def ser(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  def deser(bytes: Array[Byte], n: Int): Array[Long] = {
    require(bytes.length == n * 8,
      s"corrupt aggregation buffer: ${bytes.length} bytes for $n longs")
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](n)
    var i = 0
    while (i < n) { buf(i) = bb.getLong(); i += 1 }
    buf
  }
}
