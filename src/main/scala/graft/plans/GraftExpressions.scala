package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Generator, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the hot per-row kernels.
  *
  * Spark's higher-order functions (`aggregate`, `zip_with`, `transform`)
  * evaluate their lambdas interpreted — fine for occasional use, but the
  * similarity/dedup operators run them millions of times per partition.
  * These expressions generate straight-line Java inside WholeStageCodegen
  * (survey §4: native Expression > UDF > anything else) while computing
  * bit-identical results to the interpreted versions and the DuckDB
  * oracle twins. */

/** Sequential polynomial char-fold hash:
  * h = fold(chars, 0, (a, c) -> (a*base + c) mod m). Matches DuckDB's
  * list_reduce over string_split(s, '') for BMP input (UTF-16 unit ==
  * codepoint for all fixture data). */
case class PolyHash(child: Expression, base: Int, mod: Long)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_poly_hash"

  // manual input check (ExpectsInputTypes needs private[sql] types):
  // without it a non-string argument would pass analysis and throw a raw
  // ClassCastException mid-job
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) { h = (h * base + s.charAt(i)) % mod; i += 1 }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |java.lang.String $s = $c.toString();
         |long $h = 0L;
         |for (int $i = 0; $i < $s.length(); $i++) {
         |  $h = ($h * $base + $s.charAt($i)) % ${mod}L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

/** Sequential dot product over two float arrays: products in float32,
  * accumulated left-to-right in double — the exact op order of the
  * interpreted `aggregate(zip_with(...))` formulation and of the DuckDB
  * `list_reduce(list_transform(...))` twin (contract D7). */
case class SeqDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_seq_dot"

  // guard: getFloat on a non-float UnsafeArrayData would silently read
  // wrong byte offsets — reject anything but array<float> at analysis
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<FLOAT> arguments, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) {
      // fail loudly: silently dotting a truncated prefix would rank a
      // corrupt vector with a plausible-looking similarity
      throw new IllegalArgumentException(
        s"graft_seq_dot: length mismatch ($n vs ${b.numElements()})")
    }
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getFloat(i) * b.getFloat(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "graft_seq_dot: length mismatch (" + $n + " vs " + $b.numElements() + ")");
         |}
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getFloat($i) * $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SeqDotProduct =
    copy(left = newLeft, right = newRight)
}

/** Intersection size of two SORTED long arrays by two-pointer merge —
  * O(n+m) per pair with zero allocation, vs `array_intersect`'s per-row
  * hash-set build. Callers must pass arrays sorted ascending (q55 sorts
  * once at shingle-array build); result equals
  * `size(array_intersect(a, b))` for duplicate-free sorted inputs.
  * Null elements are skipped (never matched). */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sorted_intersect"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<BIGINT> arguments, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (n, m) = (a.numElements(), b.numElements())
    var i = 0; var j = 0; var cnt = 0L
    // null elements are skipped, never matched — getLong on a null slot
    // would silently read 0 and phantom-match a real 0 on the other side
    while (i < n && j < m) {
      if (a.isNullAt(i)) i += 1
      else if (b.isNullAt(j)) j += 1
      else {
        val x = a.getLong(i); val y = b.getLong(j)
        if (x == y) { cnt += 1; i += 1; j += 1 }
        else if (x < y) i += 1
        else j += 1
      }
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val cnt = ctx.freshName("cnt")
      s"""
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |int $i = 0; int $j = 0; long $cnt = 0L;
         |while ($i < $n && $j < $m) {
         |  if ($a.isNullAt($i)) { $i++; }
         |  else if ($b.isNullAt($j)) { $j++; }
         |  else {
         |    long $x = $a.getLong($i);
         |    long $y = $b.getLong($j);
         |    if ($x == $y) { $cnt++; $i++; $j++; }
         |    else if ($x < $y) { $i++; } else { $j++; }
         |  }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

/** [[SortedIntersectCount]] with the PPJoin verify early-exit (Xiao et
  * al., WWW'08 §4): returns the EXACT intersection size when it reaches
  * `alpha`, or -1 the moment the remaining elements can no longer get
  * there (cnt + min(remaining_a, remaining_b) < alpha). In a similarity
  * self-join almost every candidate FAILS the threshold — q55 verifies
  * ~131k occurrences for 256 survivors — so bailing at the provable
  * miss point skips most of each failing pair's merge. Same sortedness
  * and null-skip contract as the base kernel; alpha <= 0 degenerates to
  * the exact count (every count is >= 0 >= alpha). */
case class SortedIntersectMin(left: Expression, right: Expression,
    alpha: Expression) extends TernaryExpression {

  override def first: Expression = left
  override def second: Expression = right
  override def third: Expression = alpha

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sorted_intersect_min"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val arraysOk = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (arraysOk && alpha.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (ARRAY<BIGINT>, ARRAY<BIGINT>, BIGINT), got " +
        s"${left.dataType.sql}, ${right.dataType.sql}, ${alpha.dataType.sql}")
  }

  override def nullSafeEval(l: Any, r: Any, al: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val alphaV = al.asInstanceOf[Long]
    val (n, m) = (a.numElements(), b.numElements())
    var i = 0; var j = 0; var cnt = 0L
    while (i < n && j < m) {
      val rem = math.min(n - i, m - j)
      if (cnt + rem < alphaV) return -1L
      if (a.isNullAt(i)) i += 1
      else if (b.isNullAt(j)) j += 1
      else {
        val x = a.getLong(i); val y = b.getLong(j)
        if (x == y) { cnt += 1; i += 1; j += 1 }
        else if (x < y) i += 1
        else j += 1
      }
    }
    if (cnt >= alphaV) cnt else -1L
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, al) => {
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val cnt = ctx.freshName("cnt"); val rem = ctx.freshName("rem")
      s"""
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |int $i = 0; int $j = 0; long $cnt = 0L;
         |while ($i < $n && $j < $m) {
         |  int $rem = ($n - $i) < ($m - $j) ? ($n - $i) : ($m - $j);
         |  if ($cnt + $rem < $al) { break; }
         |  if ($a.isNullAt($i)) { $i++; }
         |  else if ($b.isNullAt($j)) { $j++; }
         |  else {
         |    long $x = $a.getLong($i);
         |    long $y = $b.getLong($j);
         |    if ($x == $y) { $cnt++; $i++; $j++; }
         |    else if ($x < $y) { $i++; } else { $j++; }
         |  }
         |}
         |${ev.value} = ($cnt >= $al) ? $cnt : -1L;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): SortedIntersectMin =
    copy(left = newFirst, right = newSecond, alpha = newThird)
}

/** Positional agreement count of two equal-length long arrays — the
  * MinHash signature-match kernel: |{i : a[i] == b[i]}|. Equivalent to
  * `size(filter(zip_with(a, b, (x,y) -> x = y), p -> p))` but generated
  * as one straight-line loop instead of two interpreted lambdas and an
  * intermediate boolean array per pair. Null slots never match (either
  * side null at i contributes 0). Length mismatch throws: silently
  * zipping a truncated signature would report a plausible match count
  * for a corrupt row. */
case class ZipEqualCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zip_equal"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<BIGINT> arguments, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) {
      throw new IllegalArgumentException(
        s"graft_zip_equal: length mismatch ($n vs ${b.numElements()})")
    }
    var i = 0; var cnt = 0L
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i))
        cnt += 1
      i += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val cnt = ctx.freshName("cnt")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "graft_zip_equal: length mismatch (" + $n + " vs " + $b.numElements() + ")");
         |}
         |long $cnt = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)
         |      && $a.getLong($i) == $b.getLong($i)) { $cnt++; }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZipEqualCount =
    copy(left = newLeft, right = newRight)
}

/** One-pass int8-quantization statistics over a float vector: for each
  * non-null element, code = clamp(round(x · 127/scale), −127, 127); returns
  * struct(sum_abs = Σ|code|, n_clamp = #elements whose unclamped |round|
  * exceeded 127). Replaces q83's two interpreted HOF passes
  * (`transform`+`aggregate` for the code sum, another `transform`+
  * `aggregate` for the clamp count) with one codegen loop.
  *
  * Rounding is half-AWAY-FROM-ZERO, bit-equal to Spark's `round` (and the
  * DuckDB twin): Spark rounds via the double's shortest decimal repr under
  * HALF_UP, but since k+0.5 is itself exactly representable, a shortest
  * repr can never sit on the opposite side of it from the double it
  * denotes — so comparing the binary fraction against 0.5 decides ties
  * identically, with zero allocation. Elements with |x·127/scale| ≥ 127.5
  * clamp without being rounded (they round above 127 by construction),
  * which also keeps every arithmetic step overflow-free. Null elements are
  * skipped (contribute to neither statistic); NaN quantizes to 0. */
case class QuantizeInt8Stats(child: Expression, scale: Double)
    extends UnaryExpression {
  require(scale > 0 && !scale.isInfinite, s"scale must be positive and finite, got $scale")

  private val k: Double = 127.0 / scale
  // a positive SUBNORMAL scale (e.g. 1e-320) passes the guard above yet
  // yields k = Infinity, which doGenCode would interpolate as the invalid
  // Java literal "Infinityd" — failing codegen compilation and silently
  // falling back to interpreted eval
  require(!k.isInfinite, s"127/scale overflows to Infinity (scale=$scale)")

  override def dataType: DataType = StructType(Seq(
    StructField("sum_abs", LongType, nullable = false),
    StructField("n_clamp", LongType, nullable = false)))
  override def prettyName: String = "graft_quantize_stats"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires an ARRAY<FLOAT> argument, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    var sumAbs = 0L; var nClamp = 0L
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val d = a.getFloat(i).toDouble * k
        val ad = math.abs(d)
        if (ad >= 127.5) { nClamp += 1; sumAbs += 127 }
        else {
          val f = math.floor(ad)
          sumAbs += (if (ad - f >= 0.5) f.toLong + 1 else f.toLong)
        }
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(sumAbs, nClamp)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val d = ctx.freshName("d"); val ad = ctx.freshName("ad")
      val f = ctx.freshName("f")
      val sumAbs = ctx.freshName("sumAbs"); val nClamp = ctx.freshName("nClamp")
      // $k prints the shortest decimal repr, which Java parses back to the
      // identical double — the constant survives the source round-trip
      s"""
         |int $n = $a.numElements();
         |long $sumAbs = 0L; long $nClamp = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    double $d = ((double) $a.getFloat($i)) * ${k}d;
         |    double $ad = Math.abs($d);
         |    if ($ad >= 127.5d) { $nClamp++; $sumAbs += 127L; }
         |    else {
         |      double $f = Math.floor($ad);
         |      $sumAbs += ($ad - $f >= 0.5d) ? (long) $f + 1L : (long) $f;
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[] { $sumAbs, $nClamp });
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): QuantizeInt8Stats =
    copy(child = newChild)
}

/** Sequential dot product over two long arrays (int8 quantized codes):
  * exact integer arithmetic, no rounding anywhere — |code| ≤ 127 keeps
  * any realistic dimensionality far from int64 overflow (64 dims ≤
  * 2^20). Null elements are rejected by neither side reading them:
  * mismatched lengths throw (dotting a truncated code vector would rank
  * a corrupt row with a plausible score); null SLOTS contribute 0 via
  * the isNullAt guard. The integer twin of [[SeqDotProduct]]. */
case class SeqDotLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_seq_dot_long"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<BIGINT> arguments, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) {
      throw new IllegalArgumentException(
        s"graft_seq_dot_long: length mismatch ($n vs ${b.numElements()})")
    }
    var acc = 0L
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "graft_seq_dot_long: length mismatch (" + $n + " vs " + $b.numElements() + ")");
         |}
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $acc += $a.getLong($i) * $b.getLong($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SeqDotLong =
    copy(left = newLeft, right = newRight)
}

/** Multi-band sign-LSH band keys in ONE kernel pass: for each of
  * bands·bits fixed hyperplanes (rows of `signs`, row-major
  * `(bands·bits) × dims`, entries ±1), compute the sequential dot
  * product (double accumulation, left-to-right — the oracle's
  * list_reduce op order; ±1 products are exact in every float width);
  * band b's key packs bits (dot_j > 0) for the GLOBAL plane indices
  * j = b·bits .. b·bits + bits − 1, plane b·bits as that band's MSB —
  * so the 4×4-bit fixture keys are bit-identical to the r12
  * single-BIGINT kernel's. Returns ARRAY<BIGINT> of `bands` keys, each
  * in [0, 2^bits): the r13 recall ladder grows the band COUNT with the
  * width (CorpusQueries.bandCount), so the total plane count can far
  * exceed the 63 planes one packed BIGINT carried — one key per band
  * removes the cap entirely while keeping the per-band arithmetic (and
  * the DuckDB twin's variable-width fold) unchanged. One straight-line
  * pass per row instead of per-plane `when(seq_dot(emb, array(64
  * literals)) > 0, 1)` columns, whose expression-tree size dominated
  * runtime via plan/codegen overhead at small scale. */
case class SignLshBands(child: Expression, signs: Array[Double],
    bands: Int, bits: Int, dims: Int) extends UnaryExpression {
  require(signs.length == bands * bits * dims,
    s"signs must be bands×bits×dims = ${bands * bits * dims}, got ${signs.length}")
  require(bits >= 1 && bits <= 62, s"band key packs into a BIGINT: got $bits")
  require(bands >= 1, s"need at least one band, got $bands")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_sign_lsh_bands"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires an ARRAY<FLOAT> argument, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != dims) {
      throw new IllegalArgumentException(
        s"graft_sign_lsh_bands: expected $dims elements, got $n")
    }
    val keys = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var key = 0L
      var t = 0
      while (t < bits) {
        val j = b * bits + t
        var acc = 0.0
        var i = 0
        while (i < n) { acc += a.getFloat(i).toDouble * signs(j * dims + i); i += 1 }
        key = (key << 1) | (if (acc > 0) 1L else 0L)
        t += 1
      }
      keys(b) = key
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(keys)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val signsRef = ctx.addReferenceObj("signs", signs, "double[]")
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val b = ctx.freshName("b"); val t = ctx.freshName("t")
      val acc = ctx.freshName("acc"); val key = ctx.freshName("key")
      val keys = ctx.freshName("keys")
      s"""
         |int $n = $a.numElements();
         |if ($n != $dims) {
         |  throw new IllegalArgumentException(
         |    "graft_sign_lsh_bands: expected $dims elements, got " + $n);
         |}
         |long[] $keys = new long[$bands];
         |for (int $b = 0; $b < $bands; $b++) {
         |  long $key = 0L;
         |  for (int $t = 0; $t < $bits; $t++) {
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $acc += ((double) $a.getFloat($i))
         |        * $signsRef[($b * $bits + $t) * $dims + $i];
         |    }
         |    $key = ($key << 1) | ($acc > 0 ? 1L : 0L);
         |  }
         |  $keys[$b] = $key;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($keys);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SignLshBands =
    copy(child = newChild)
}

/** 32-bit Morton (Z-order) code: interleaves the low 16 bits of two
  * longs (x in even bit positions, y in odd), via the classic
  * magic-mask bit spreading — branch-free straight-line codegen.
  *
  * This is the write-time layout kernel for multi-dimension data
  * skipping (q100): rows sorted/range-partitioned by their Morton code
  * land in files covering small RECTANGLES of (x, y) space, so parquet
  * min/max stats prune scans filtered on EITHER dimension — a single-
  * column sort only ever prunes its own column. The same mask chain is
  * expressible with BIGINT bitwise ops in ANSI SQL, which is what the
  * DuckDB oracle twin does. */
case class MortonCode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_morton"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (BIGINT, BIGINT), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  @inline private def spread(v: Long): Long = {
    var x = v & 0xFFFFL
    x = (x | (x << 8)) & 0x00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0FL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    spread(a.asInstanceOf[Long]) | (spread(b.asInstanceOf[Long]) << 1)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val xs = ctx.freshName("xs"); val ys = ctx.freshName("ys")
      def spreadJava(src: String, dst: String): String =
        s"""
           |long $dst = $src & 0xFFFFL;
           |$dst = ($dst | ($dst << 8)) & 0x00FF00FFL;
           |$dst = ($dst | ($dst << 4)) & 0x0F0F0F0FL;
           |$dst = ($dst | ($dst << 2)) & 0x33333333L;
           |$dst = ($dst | ($dst << 1)) & 0x55555555L;
         """.stripMargin
      s"""
         |${spreadJava(a, xs)}
         |${spreadJava(b, ys)}
         |${ev.value} = $xs | ($ys << 1);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MortonCode =
    copy(left = newLeft, right = newRight)
}

/** True Catalyst Generator for q49: one output row per word bigram of
  * `child`, produced directly from the string — no intermediate array
  * materialization and no UDF serialization barrier (survey §4's last
  * "UDF where an Expression fits" instance, closed). Tokenization
  * contract matches the UDF it replaces exactly (split on single
  * spaces, limit -1 so trailing empty tokens survive — the DuckDB
  * string_split twin's behavior); GraftFunctionsSpec keeps the UDF form as
  * the equivalence law. Generators only join WholeStageCodegen through
  * the dedicated CollectionGenerator path (explode/posexplode), so like
  * Spark's own `Stack`/`JsonTuple` this one evaluates row-at-a-time
  * inside GenerateExec — still strictly less work than the UDF form,
  * which paid the same per-row evaluation PLUS building each bigram
  * array and crossing the UDF boundary. */
case class WordBigrams(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def prettyName: String = "graft_bigrams"

  override def elementSchema: StructType =
    new StructType().add("bigram", StringType, nullable = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.sql}")

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): IterableOnce[org.apache.spark.sql.catalyst.InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else {
      val toks = v.asInstanceOf[UTF8String].toString.split(" ", -1)
      if (toks.length < 2) Iterator.empty
      else (0 until toks.length - 1).iterator.map { i =>
        org.apache.spark.sql.catalyst.InternalRow(
          UTF8String.fromString(toks(i) + " " + toks(i + 1)))
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): WordBigrams =
    copy(child = newChild)
}

object GraftExpressions {
  /** Column wrapper: engine-portable polynomial string hash. */
  def poly_hash(c: Column, base: Int = 131, mod: Long = 2147483647L): Column =
    toColumn(PolyHash(toExpression(c), base, mod))

  /** Column wrapper: sequential float-array dot product (double result). */
  def seq_dot(a: Column, b: Column): Column =
    toColumn(SeqDotProduct(toExpression(a), toExpression(b)))

  /** Column wrapper: intersection size of two sorted long arrays. */
  def sorted_intersect(a: Column, b: Column): Column =
    toColumn(SortedIntersectCount(toExpression(a), toExpression(b)))

  /** Column wrapper: thresholded sorted intersection (exact count when
    * >= alpha, -1 on provable miss — the PPJoin verify early-exit). */
  def sorted_intersect_min(a: Column, b: Column, alpha: Column): Column =
    toColumn(SortedIntersectMin(toExpression(a), toExpression(b),
      toExpression(alpha)))

  /** Column wrapper: positional agreement count of two long arrays. */
  def zip_equal(a: Column, b: Column): Column =
    toColumn(ZipEqualCount(toExpression(a), toExpression(b)))

  /** Column wrapper: one-pass int8 quantization stats
    * struct(sum_abs, n_clamp). */
  def quantize_stats(v: Column, scale: Double): Column =
    toColumn(QuantizeInt8Stats(toExpression(v), scale))

  /** Column wrapper: per-band sign-LSH keys as ARRAY<BIGINT>. */
  def sign_lsh_bands(v: Column, signs: Array[Double],
      bands: Int, bits: Int, dims: Int): Column =
    toColumn(SignLshBands(toExpression(v), signs, bands, bits, dims))

  /** Column wrapper: exact integer dot product of two long arrays. */
  def seq_dot_long(a: Column, b: Column): Column =
    toColumn(SeqDotLong(toExpression(a), toExpression(b)))

  /** Column wrapper: 32-bit Morton (Z-order) interleave of two BIGINTs. */
  def morton(x: Column, y: Column): Column =
    toColumn(MortonCode(toExpression(x), toExpression(y)))

  /** Column wrapper: the word-bigram Generator (one row per bigram). */
  def word_bigrams(c: Column): Column =
    toColumn(WordBigrams(toExpression(c)))
}
