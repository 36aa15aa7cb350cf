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

  /** Cosine similarity of two float vectors. */
  def cosine(a: Column, b: Column): Column =
    seq_dot(a, b) / (l2Norm(a) * l2Norm(b))

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
      greatest(lit(-127), least(lit(127),
        round(x * (127.0 / scale)))).cast("tinyint"))

  /** Dequantize back to float. */
  def dequantizeInt8(q: Column, scale: Double): Column =
    transform(q, x => (x * (scale / 127.0)).cast("float"))
}
