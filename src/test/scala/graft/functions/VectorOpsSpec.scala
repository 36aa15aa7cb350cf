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

  test("quantize_stats kernel equals the interpreted HOF formulation") {
    import graft.plans.GraftExpressions.quantize_stats
    // exact half-away-from-zero ties (k=1.0 at scale=127: 2.5 → 3,
    // −2.5 → −3), the clamp boundary (127.5 → clamp, 127.49 → 127),
    // saturating values, zeros, and a pseudo-random tail
    val rnd = new scala.util.Random(83)
    val vecs = Seq(
      Seq(2.5f, -2.5f, 0.5f, -0.5f),
      Seq(127.5f, -127.5f, 127.49f, -127.49f, 126.5f),
      Seq(500f, -500f, 0f, 1e-10f),
      Seq.fill(64)(rnd.nextFloat() * 300f - 150f))
    for (scale <- Seq(127.0, 0.5); v <- vecs) {
      val df = vdf(v)
      val interpSum = df.select(aggregate(
          VectorOps.int8Codes(col("v"), scale), lit(0L),
          (acc, x) => acc + abs(x))).head().getLong(0)
      val interpClamp = df.select(
        VectorOps.int8ClampedCount(col("v"), scale)).head().getLong(0)
      val kr = df.select(quantize_stats(col("v"), scale).as("q"))
        .select(col("q.sum_abs"), col("q.n_clamp")).head()
      assert(kr.getLong(0) === interpSum, s"sum_abs, scale=$scale v=$v")
      assert(kr.getLong(1) === interpClamp, s"n_clamp, scale=$scale v=$v")
    }
    // null elements are skipped — contribute to neither statistic.
    // NB this is asserted on the KERNEL side only, deliberately: the
    // interpreted aggregate above would propagate a null element into a
    // null sum_abs, so the kernel's skip-nulls behavior intentionally
    // DIVERGES from (fixes) the old interpreted path — it matches the
    // DuckDB oracle's list_sum, which also skips nulls. The kernel ≡
    // interpreted equivalence claimed by this test holds for null-free
    // vectors (the loop above), not for vectors with null elements.
    val sess2 = spark
    import sess2.implicits._
    val withNull = Seq(Seq(Some(2.5f), None, Some(500f))).toDF("v")
      .select(quantize_stats($"v".cast("array<float>"), 127.0).as("q"))
      .select(col("q.sum_abs"), col("q.n_clamp")).head()
    assert(withNull.getLong(0) === 130L && withNull.getLong(1) === 1L)
  }

  test("int8Codes/int8ClampedCount exercise the clamp branch directly") {
    // the q83 oracle gate sees almost no saturated dims at fixture
    // scale (0 at sf0.001), so the clamp branch is pinned here with
    // synthetic out-of-range vectors instead
    val df = vdf(Seq(5f, -5f, 0.5f, -0.503937f), Seq(0.1f, -0.1f, 0f, 0f))
    val out = df.orderBy("id")
      .select(VectorOps.int8Codes(col("v"), scale = 0.5).as("c"),
        VectorOps.int8ClampedCount(col("v"), scale = 0.5).as("n"))
      .collect()
    // 5/-5 saturate; 0.5 → exactly 127 (no clamp); -0.503937·254 ≈ -128 → clamped
    assert(out(0).getSeq[Long](0) === Seq(127L, -127L, 127L, -127L))
    assert(out(0).getLong(1) === 3L)
    assert(out(1).getSeq[Long](0) === Seq(25L, -25L, 0L, 0L))
    assert(out(1).getLong(1) === 0L)
  }

  test("q137 law: int8 quantization preserves well-separated rankings (recall 1)") {
    // corpus dots spaced 0.025 apart — two orders of magnitude above
    // the int8 step (0.5/127 ≈ 0.004 per dim): quantized and exact
    // top-5 must coincide exactly. A recall < 1 here would mean the
    // quantized ranking broke on data it has no excuse to break on.
    val sess = spark
    import sess.implicits._
    val emb = (0 to 9).map { k =>
      (k.toLong,
        if (k == 0) Seq(0.5f, 0f) else Seq(0.05f * k, 0f))
    }.toDF("vec_id", "embedding")   // vec_id 0 is the one bounded query
    val out = graft.operators.SimilarityQueries.quantRecall(emb).collect()
    assert(out.length === 1)
    assert(out.head.getLong(1) === 5L, "all 5 exact neighbors recovered")
    assert(out.head.getDouble(2) === 1.0)
  }

  test("q203 law: truncation is lossless when the info lives in the kept dims") {
    // vectors whose dims beyond MrlDims are all zero: the truncated
    // cosine IS the full cosine, so recall must be exactly 1. On the
    // random fixture embeddings the same instrument reads ≪ 1 — that
    // contrast (not a high number) is what the key exists to measure.
    val sess = spark
    import sess.implicits._
    val D = graft.operators.SimilarityQueries.MrlDims
    val emb = (0 to 9).map { k =>
      val v = Array.fill(D + 4)(0f)
      v(k % D) = 1f + 0.01f * k   // distinct directions, first-16-dim info
      v(1) = 0.05f * k
      (k.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
    val out = graft.operators.SimilarityQueries.mrlRecall(emb).collect()
    assert(out.length === 1)   // vec_id 0 is the one bounded query
    assert(out.head.getLong(1) === 5L && out.head.getDouble(2) === 1.0,
      "zero tail dims ⇒ truncated ranking must equal the full ranking")
    // and on the real fixture the instrument must report a PROPER ratio
    val fx = graft.operators.SimilarityQueries
      .queries("q203_mrl_recall")(spark, "/root/testdata/sf0.001").collect()
    assert(fx.nonEmpty)
    fx.foreach { r =>
      val rec = r.getDouble(2)
      assert(rec >= 0.0 && rec <= 1.0 && r.getLong(1) <= 5L)
    }
  }
}
