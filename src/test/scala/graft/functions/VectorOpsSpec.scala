package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class VectorOpsSpec extends SparkSpec {

  private def vdf(vs: Seq[Float]*) = {
    val sess = spark
    import sess.implicits._
    vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
  }

  test("l2Norm, cosine, normalize") {
    val df = vdf(Seq(3f, 4f), Seq(1f, 0f), Seq(0f, 0f))
    val norms = df.select(VectorOps.l2Norm(col("v"))).collect().map(_.getDouble(0))
    assert(norms(0) === 5.0 && norms(1) === 1.0 && norms(2) === 0.0)

    val cos = vdf(Seq(1f, 0f)).crossJoin(
        vdf(Seq(0f, 1f)).select(col("v").as("w")))
      .select(VectorOps.cosine(col("v"), col("w"))).head().getDouble(0)
    assert(cos === 0.0)

    val unit = df.select(VectorOps.normalize(col("v")))
      .collect().map(_.getSeq[Float](0))
    assert(unit(0) === Seq(0.6f, 0.8f))
    assert(unit(2) === Seq(0f, 0f), "zero vector passes through")
  }

  test("int8 quantize round-trips within scale/127 error") {
    val v = Seq(0.9f, -0.5f, 0.01f, 1.0f, -1.0f)
    val df = vdf(v)
    val q = df.select(VectorOps.quantizeInt8(col("v"), scale = 1.0).as("q"))
    val back = q.select(VectorOps.dequantizeInt8(col("q"), scale = 1.0))
      .head().getSeq[Float](0)
    v.zip(back).foreach { case (orig, rt) =>
      assert(math.abs(orig - rt) <= 1.0 / 127.0 + 1e-6,
        s"$orig -> $rt exceeds quantization error bound")
    }
    // null elements stay null (least/greatest would otherwise clamp
    // them to the bound)
    val sess2 = spark
    import sess2.implicits._
    val withNull = Seq(Seq(Some(0.5f), None)).toDF("v")
      .select(VectorOps.quantizeInt8($"v".cast("array<float>"), 1.0))
      .head().getSeq[Any](0)
    assert(withNull(0) != null && withNull(1) == null)
    // clamp check: out-of-scale values saturate
    val sat = vdf(Seq(5f, -5f))
      .select(VectorOps.quantizeInt8(col("v"), scale = 1.0))
      .head().getSeq[Byte](0)
    assert(sat === Seq[Byte](127, -127))
  }
}
