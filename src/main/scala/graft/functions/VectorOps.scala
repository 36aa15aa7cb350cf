package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.plans.GraftExpressions.seq_dot

/** Embedding-column preprocessing for similarity pipelines: norms,
  * cosine, unit-normalization, and symmetric int8 quantization (the
  * storage trick that cuts a 100 TB float32 embedding corpus to a
  * quarter). All built-ins + the codegen'd seq_dot kernel; quantization
  * is deterministic (fixed scale, round-half-up) so quantized corpora
  * are reproducible. */
object VectorOps {

  /** L2 norm (sequential fold — D7 determinism). */
  def l2Norm(v: Column): Column = sqrt(seq_dot(v, v))

  /** Cosine similarity of two float vectors — the single formulation every
    * similarity operator uses. Zero-norm vectors yield NULL on BOTH
    * engines (the oracle twins carry the same CASE guard); without it
    * Spark's non-ANSI x/0 gives NULL while DuckDB's float division gives
    * NaN, which sorts and filters differently. */
  def cosine(a: Column, b: Column): Column = {
    val na = seq_dot(a, a)
    val nb = seq_dot(b, b)
    when(na === 0.0 || nb === 0.0, lit(null).cast("double"))
      .otherwise(seq_dot(a, b) / (sqrt(na) * sqrt(nb)))
  }

  /** Cosine from a pair dot product plus PRECOMPUTED per-vector norms.
    * The two norm folds inside [[cosine]] are per-*vector* quantities;
    * evaluating them per *pair* is ~3× the necessary FLOPs in any
    * candidate-verify join. Compute `l2Norm` once per vector (a linear
    * pass), carry it through the join, and pair cost drops to one
    * `seq_dot`. Bit-identical to [[cosine]] (contract D7): the norm is
    * the same sequential fold over the same input whether computed once
    * or per pair, `sqrt` is correctly rounded, and the final
    * `dot / (nrmA * nrmB)` is the same op sequence as
    * `dot / (sqrt(na) * sqrt(nb))`. Zero-norm guard matches too
    * (`sqrt(x) == 0` iff `x == 0` for the non-negative fold). */
  def cosinePre(dot: Column, nrmA: Column, nrmB: Column): Column =
    when(nrmA === 0.0 || nrmB === 0.0, lit(null).cast("double"))
      .otherwise(dot / (nrmA * nrmB))

  /** Unit-normalize into a float vector (zero vectors pass through). */
  def normalize(v: Column): Column = {
    val n = l2Norm(v)
    when(n === 0.0, v)
      .otherwise(transform(v, x => (x / n).cast("float")))
  }

  /** Symmetric int8 quantization at a fixed scale: q = round(x*127/scale)
    * clamped to [-127, 127]. `scale` should be the corpus max-abs. */
  def quantizeInt8(v: Column, scale: Double): Column =
    transform(v, x =>
      // explicit null guard: least/greatest SKIP nulls, so an unguarded
      // null element would clamp to the literal bound (127) instead of
      // staying null
      when(x.isNotNull,
        greatest(lit(-127), least(lit(127),
          round(x * (127.0 / scale)))).cast("tinyint"))
        .otherwise(lit(null).cast("tinyint")))

  /** Dequantize back to float. */
  def dequantizeInt8(q: Column, scale: Double): Column =
    transform(q, x => (x * (scale / 127.0)).cast("float"))

  /** Long-typed quantization codes (the [[quantizeInt8]] arithmetic
    * before the tinyint cast) — the cross-engine-checkable surface: a
    * single half-away-from-zero round on a double, then an integer
    * clamp. */
  def int8Codes(v: Column, scale: Double): Column =
    transform(v, x =>
      greatest(lit(-127L), least(lit(127L),
        round(x * (127.0 / scale)).cast("long"))))

  /** Count of dimensions saturating the ±127 clamp at `scale`. */
  def int8ClampedCount(v: Column, scale: Double): Column =
    aggregate(
      transform(v, x =>
        when(abs(round(x * (127.0 / scale)).cast("long")) > 127, 1L)
          .otherwise(lit(0L))),
      lit(0L), (acc, c) => acc + c)
}
