package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CorpusSpec extends SparkSpec {

  test("q70/q71 sampling arithmetic never overflows int64 (ANSI mode)") {
    val sess = spark
    import sess.implicits._
    // doc_ids at the top of the int64 range: the unreduced multiply
    // (doc_id * 2654435761) would ANSI-throw here; the mod-first form
    // must not
    val docs = Seq(Long.MaxValue - 1, Long.MaxValue - 101, 3L)
      .toDF("doc_id")
    val sampled = docs
      .filter(pmod(pmod(col("doc_id"), lit(100)) * 61L, lit(100)) < 10)
      .collect() // must not throw
    assert(sampled.length <= 3)
    val key = pmod(
      pmod(col("doc_id"), lit(2147483647L)) * 1103515245L + 12345L,
      lit(2147483647L))
    val keys = docs.select(key.as("k")).collect().map(_.getLong(0))
    assert(keys.forall(k => k >= 0 && k < 2147483647L))
  }

  test("mixSources equals the naive rank cutoff, exact quotas, drops unknown sources") {
    val sess = spark
    import sess.implicits._
    import org.apache.spark.sql.expressions.Window
    // skewed synthetic corpus: source sizes 1, 7, 400, plus an unlisted
    // source; tiny bucket count forces MANY boundary buckets per source
    val docs = (
      (1L to 400L).map(i => (i, "big")) ++
      (401L to 407L).map(i => (i, "small")) ++
      Seq((408L, "one"), (409L, "unlisted"))
    ).toDF("doc_id", "source")
    val weights = Map("big" -> 337, "small" -> 500, "one" -> 1000)
    val mixed = CorpusQueries.mixSources(docs, weights, nBuckets = 4)
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    // exact ceil quotas: big 400*337/1000 -> 135, small ceil(3.5) -> 4
    val bySrc = mixed.groupBy(_._2).view.mapValues(_.size).toMap
    assert(bySrc === Map("big" -> 135, "small" -> 4, "one" -> 1))
    // equivalence with the formulation that does not scale: rank per
    // source by (shuffle key, doc_id), keep rn <= quota
    val hk = pmod(
      pmod(col("doc_id"), lit(2147483647L)) * 1103515245L + 12345L,
      lit(2147483647L))
    val w = Window.partitionBy("source").orderBy(hk, col("doc_id"))
    val naive = docs
      .withColumn("rn", row_number().over(w))
      .withColumn("n_src", count(lit(1)).over(Window.partitionBy("source")))
      .withColumn("quota",
        element_at(typedLit(weights), col("source")) * col("n_src"))
      .filter(col("rn").cast("long") * 1000 <= col("quota") + 999)
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(mixed === naive, "bucketed selection must equal the rank cutoff")
    // wpm = 1000 keeps everything; unlisted sources keep nothing
    assert(mixed.count(_._2 == "one") === 1)
    assert(!mixed.exists(_._2 == "unlisted"))
  }

  test("stratified sample keeps at most k per stratum, deterministically") {
    val dir = "/root/testdata/sf0.001"
    val run1 = CorpusQueries.queries("q71_sample_stratified")(spark, dir)
      .collect().map(_.toSeq).toSeq
    val run2 = CorpusQueries.queries("q71_sample_stratified")(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(run1 === run2, "sampling must be a pure function of the data")
    val perLang = run1.groupBy(_.head).view.mapValues(_.size)
    assert(perLang.values.forall(_ <= 20))
  }

  test("sign-LSH candidates are a subset of all pairs with exact cosine kept") {
    val dir = "/root/testdata/sf0.001"
    val out = CorpusQueries.queries("q73_embed_lsh")(spark, dir).collect()
    // every reported pair must genuinely clear the cosine threshold and
    // be id-ordered (regression for the band-key construction)
    out.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.4 - 1e-9)
    }
  }

  test("Bloom sketch bridge: no false negatives, bounded false positives") {
    import graft.plans.SketchBridge.{bloom_agg, might_contain}
    val sess = spark
    import sess.implicits._
    val members = (0L until 5000L).map(_ * 2654435761L % 1000003L).distinct
    val sketch = members.toDF("h")
      .select(bloom_agg(col("h"), 10000L, 80000L).as("bf"))
      .head().getAs[Array[Byte]](0)
    // every inserted element must probe true (Bloom's core guarantee —
    // this is what makes q98's prefilter safe before the exact join)
    val misses = members.toDF("h")
      .filter(!might_contain(lit(sketch), col("h"))).count()
    assert(misses === 0L, "Bloom filters must have zero false negatives")
    // non-members: FPR should be in the vicinity of the m/n design
    // point, not degenerate (all-true would make the prefilter useless)
    val nonMembers = (1L to 20000L).map(v => v * 48271L + 7L)
      .filterNot(members.toSet)
    val fp = nonMembers.toDF("h")
      .filter(might_contain(lit(sketch), col("h"))).count()
    assert(fp.toDouble / nonMembers.size < 0.10,
      s"false-positive rate ${fp.toDouble / nonMembers.size} out of design range")
  }

  test("q130: temperature weights sum to 1; small sources oversample more") {
    val out = CorpusQueries
      .queries("q130_mix_temperature")(spark, "/root/testdata/sf0.001")
      .collect()
    val wsum = out.map(_.getAs[Double]("weight")).sum
    assert(math.abs(wsum - 1.0) < 1e-4, s"weights must sum to 1, got $wsum")
    val epoch = out.map(_.getAs[Long]("n_docs")).sum
    val esum = out.map(_.getAs[Long]("expected_docs")).sum
    // per-source half-up rounding drifts the total by at most 0.5/source
    assert(math.abs(esum - epoch) <= out.length,
      s"expected-doc total $esum far from epoch size $epoch")
    // alpha = 0.5 up-weights small sources: oversample factors are
    // non-increasing as n_docs grows (sqrt(n)/n monotonicity)
    val byN = out.sortBy(_.getAs[Long]("n_docs"))
      .map(_.getAs[Double]("oversample"))
    assert(byN.zip(byN.tail).forall { case (a, b) => a >= b - 1e-9 },
      s"oversample must fall as source size grows: ${byN.toSeq}")
  }

  test("q160: A-ES sample equals exact recompute and plans as top-k") {
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.001"
    val df = CorpusQueries.queries("q160_sample_weighted")(spark, dir)
    // top-k, never a full sort: the global limit must fuse into
    // TakeOrderedAndProject (per-partition heaps)
    assert(df.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"),
      "A-ES sample must plan as TakeOrderedAndProject")
    val got = df.collect()
      .map(r => (r.getLong(0), r.getAs[Long]("key_pico"))).toSeq
    // exact driver-side replay of the LCG draw + exponential key
    val fix = graft.Tables.t(spark, dir, "documents")
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expect = fix.map { case (id, w) =>
      val h = ((id % 2147483647L) * 69621L + 7L) % 2147483647L
      val u = (h + 1L).toDouble / 2147483648.0
      (id, math.floor(-math.log(u) / w * 1e12 + 1e-6).toLong)
    }.sortBy { case (id, k) => (k, id) }.take(20).toSeq
    assert(got === expect, "engine sample must equal the exact A-ES replay")
    // length bias: the sampled docs skew long — their mean n_chars
    // exceeds the corpus mean (w = n_chars is the sampling weight)
    val sampleMean = df.collect().map(_.getAs[Long]("n_chars")).sum.toDouble / 20
    val corpusMean = fix.map(_._2).sum.toDouble / fix.length
    assert(sampleMean > corpusMean,
      s"length-weighted sample mean $sampleMean under corpus mean $corpusMean")
  }

  test("q188: Gini reads 0 on equal buckets and (n-1)/n when one owns all") {
    val sess = spark
    import sess.implicits._
    def g(sizes: Seq[(String, Long)]): Double =
      CorpusQueries.giniOf(sizes.toDF("k", "x")).head().getAs[Double]("gini")
    assert(g(Seq(("a", 10L), ("b", 10L), ("c", 10L), ("d", 10L))) === 0.0,
      "perfect balance scores zero")
    // one bucket owns everything (others ~0 represented as 0-size is
    // degenerate; use 1-vs-rest-tiny): analytic max for n=4 is 0.75
    val skew = g(Seq(("a", 0L), ("b", 0L), ("c", 0L), ("d", 100L)))
    assert(skew === 0.75, s"n=4 winner-takes-all must read (n-1)/n, got $skew")
    // monotone: concentrating mass raises the coefficient
    assert(g(Seq(("a", 1L), ("b", 1L), ("c", 1L), ("d", 97L))) >
      g(Seq(("a", 20L), ("b", 25L), ("c", 25L), ("d", 30L))))
  }

  test("q181: group percentiles equal the exact per-lang sorted-rank recompute") {
    val dir = "/root/testdata/sf0.001"
    val got = CorpusQueries.queries("q181_group_percentiles")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val rows = graft.Tables.t(spark, dir, "documents")
      .select(org.apache.spark.sql.functions.col("lang"),
        org.apache.spark.sql.functions.col("n_chars"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expect = rows.groupBy(_._1).map { case (lang, g) =>
      val v = g.map(_._2).sorted
      val n = v.length
      lang -> (n.toLong, v((n + 1) / 2 - 1),
        v(math.ceil(n * 9 / 10.0).toInt - 1), v.last)
    }
    assert(got === expect, "rank cuts must equal the exact sorted recompute")
    got.values.foreach { case (_, p50, p90, mx) =>
      assert(p50 <= p90 && p90 <= mx, "percentiles must be ordered")
    }
  }

  test("q162: diff statuses partition the union and match the synthesis arithmetic") {
    val dir = "/root/testdata/sf0.001"
    val out = CorpusQueries.queries("q162_snapshot_diff")(spark, dir)
      .collect()
      .groupBy(_.getAs[String]("status"))
      .map { case (st, rows) => st -> rows.map(_.getAs[Long]("n_docs")).sum }
    val ids = graft.Tables.t(spark, dir, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"))
      .collect().map(_.getLong(0))
    // the synthesis makes the classes pure doc_id arithmetic: %10=7 was
    // never in v1 (added), %10=3 never in v2 (removed), %5=1 rewrote
    // (changed — disjoint from both since %5=1 → %10 ∈ {1,6})
    val expect = Map(
      "added" -> ids.count(_ % 10 == 7).toLong,
      "removed" -> ids.count(_ % 10 == 3).toLong,
      "changed" -> ids.count(i => i % 5 == 1).toLong,
      "unchanged" -> ids.count(i =>
        i % 10 != 7 && i % 10 != 3 && i % 5 != 1).toLong)
    assert(out === expect.filter(_._2 > 0),
      "status counts must equal the snapshot synthesis arithmetic")
    assert(out.values.sum === ids.length,
      "the four statuses must partition the id universe")
  }

  test("q167: RP recall equals an exact driver-side replay of both rankings") {
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.001"
    val got = CorpusQueries.queries("q167_rp_recall")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_hit")).toMap
    val rows = graft.Tables.t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def sign(i: Int, j: Int): Float =
      if (((i * 73 + j * 179 + i * j * 31) % 2039) % 2 == 0) 1.0f else -1.0f
    // engine-exact arithmetic: float multiply, double accumulation
    def fdot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }; acc
    }
    val proj = rows.map { case (id, v) =>
      id -> Array.tabulate(16)(j =>
        fdot(v, Array.tabulate(64)(i => sign(i + 1, j))))
    }.toMap
    def ddot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }; acc
    }
    val vecs = rows.toMap
    val qids = rows.map(_._1).filter(id => id % 50 == 0 && id < 5000)
    val expect = qids.map { qid =>
      def top5(score: Long => Double): Set[Long] =
        rows.map(_._1).filter(_ != qid)
          .sortBy(n => (-score(n), n)).take(5).toSet
      val ex = top5(n => fdot(vecs(qid), vecs(n)))
      val ap = top5(n => ddot(proj(qid), proj(n)))
      qid -> (ex & ap).size.toLong
    }.toMap
    assert(got === expect,
      "engine recall must equal the exact dual-ranking replay")
  }

  test("q163: kNN-graph degree histogram obeys the mutual-k structural laws") {
    val dir = "/root/testdata/sf0.001"
    val out = CorpusQueries.queries("q163_knn_graph")(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("degree"), r.getAs[Long]("n_vecs")))
    val nVecs = graft.Tables.t(spark, dir, "embeddings").count()
    assert(out.map(_._2).sum === nVecs,
      "histogram must cover every vector, including degree 0")
    assert(out.forall(_._1 <= 5),
      "mutual degree cannot exceed k = 5 (each side keeps at most 5)")
    val edgeEndpoints = out.map { case (d, n) => d * n }.sum
    assert(edgeEndpoints % 2 === 0,
      "sum of degrees must be even (each mutual edge has two endpoints)")
    assert(edgeEndpoints > 0, "the fixture corpus must produce some mutual edges")
  }

  test("q192: LSH-width recall equals an exact driver-side replay " +
      "(true set, band candidates, NULL-denominator convention)") {
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.001"
    val got = CorpusQueries.queries("q192_lsh_recall")(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    val rows = graft.Tables.t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    // engine-exact arithmetic: float multiply, double accumulation
    def fdot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }; acc
    }
    def sign(i: Int, j: Int): Float =
      if (((i * 73 + j * 179 + i * j * 31) % 2039) % 2 == 0) 1.0f else -1.0f
    val bits = CorpusQueries.bandBits(rows.length.toLong)
    assert(bits === 4, "fixture corpus must sit on the ladder floor")
    val nb = CorpusQueries.bandCount(bits)
    assert(nb === 4, "the 4-bit rung keeps the historical 4 bands")
    val vecs = rows.toMap
    def bandsOf(v: Array[Float]): Set[(Int, Long)] = {
      val b = (0 until nb * bits).map { j =>
        if (fdot(v, Array.tabulate(64)(i => sign(i + 1, j))) > 0) 1L else 0L
      }
      (0 until nb).map(k => k ->
        (0 until bits).foldLeft(0L)((a, t) => (a << 1) | b(k * bits + t))).toSet
    }
    val bnd = rows.map { case (id, v) => id -> bandsOf(v) }.toMap
    def cos(a: Array[Float], b: Array[Float]): Option[Double] = {
      val na = math.sqrt(fdot(a, a)); val nb = math.sqrt(fdot(b, b))
      if (na == 0 || nb == 0) None else Some(fdot(a, b) / (na * nb))
    }
    val qids = rows.map(_._1).filter(id => id % 50 == 0 && id < 5000)
    assert(qids.nonEmpty)
    val expect = qids.map { qid =>
      val others = rows.map(_._1).filter(_ != qid)
      val tru = others.filter(n => cos(vecs(qid), vecs(n)).exists(_ >= 0.4))
      val hit = tru.filter(n => (bnd(qid) & bnd(n)).nonEmpty)
      val recall = if (tru.isEmpty) None
        else Some(BigDecimal(hit.size.toDouble / tru.size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      qid -> ((tru.size.toLong, hit.size.toLong, recall))
    }.toMap
    assert(got === expect,
      "engine recall must equal the exact set-membership replay")
  }

  test("bandBits ladder: fixture-invariant floor, boundary steps, 12-bit cap") {
    // the sign-LSH twin of centroidStride: any change to these pins
    // changes the gated outputs of q73/q109/q135/q143/q163 AND must be
    // mirrored in lshBandCtes' SQL ladder (generated from 128·2^b — this
    // test is the boundary-value witness both share)
    val bb = CorpusQueries.bandBits _
    // every fixture scale (22 / 200 / 2000 embeddings) stays at the
    // historical 4-bit scheme — sweeps at sf0.001/0.01/0.1 are invariant
    assert(Seq(0L, 22L, 200L, 2000L, 2048L).map(bb) === Seq(4, 4, 4, 4, 4))
    assert(bb(2049L) === 5, "first step past the 4-bit occupancy bound")
    assert(bb(4096L) === 5)
    assert(bb(20000L) === 8, "the sf1 scale point's width")
    assert(bb(262144L) === 11)
    assert(bb(262145L) === 12)
    assert(bb(1000000000L) === 12, "capped, the re-tune point")
    // monotone non-decreasing (a growing corpus never widens buckets)
    val samples = (0 to 60).map(i => 1L << (i.min(40)))
    assert(samples.map(bb) === samples.map(bb).sorted)
  }

  test("bandCount ladder: historical 4-bit pin, analytic recall floor, " +
      "one source of truth with the oracle's nbands CASE") {
    // p = 1 − arccos(0.4)/π; every rung but the pinned 4-bit one must
    // hold analytic threshold recall 1−(1−p^k)^b ≥ 0.45, and b must be
    // MINIMAL (b−1 falls below the floor) — the table is derived
    // offline, so this test is the witness that the constants match
    // their derivation; lshBandCtes generates the SQL CASE from the
    // same map, so the oracle can't drift
    val p = 1.0 - math.acos(0.4) / math.Pi
    def recall(k: Int, b: Int): Double =
      1.0 - math.pow(1.0 - math.pow(p, k), b)
    assert(CorpusQueries.bandCount(4) === 4,
      "the 4-bit rung is pinned at its historical band count")
    for (k <- 5 to 12) {
      val b = CorpusQueries.bandCount(k)
      assert(recall(k, b) >= 0.45, s"rung $k: recall(${b}) below floor")
      assert(recall(k, b - 1) < 0.45, s"rung $k: $b not minimal")
    }
    // monotone: narrower buckets never mean fewer bands
    val bs = (4 to 12).map(CorpusQueries.bandCount)
    assert(bs === bs.sorted)
  }

  test("codedBands at a non-fixture width: band keys equal a driver-side " +
      "recompute from planeSign, bandCount(bits) bands, keys < 2^bits") {
    val sess = spark
    import sess.implicits._
    val dims = 64; val bits = 6
    val bands = CorpusQueries.bandCount(bits)
    def sign(i: Int, j: Int): Float =
      if (((i * 73 + j * 179 + i * j * 31) % 2039) % 2 == 0) 1.0f else -1.0f
    val rnd = new scala.util.Random(40177)
    val vecs = (0L until 25L).map(id =>
      (id, Array.fill(dims)(rnd.nextFloat() * 2f - 1f)))
    val df = vecs.toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
    val got = CorpusQueries.codedBands(df, bits)
      .select("vec_id", "bk").as[(Long, String)].collect().toSet
    val want = vecs.flatMap { case (id, v) =>
      val bitsOf = (0 until bands * bits).map { j =>
        var acc = 0.0
        for (i <- 0 until dims) acc += v(i).toDouble * sign(i + 1, j)
        if (acc > 0) 1 else 0
      }
      (0 until bands).map { b =>
        val key = (0 until bits).foldLeft(0L)((a, t) =>
          (a << 1) | bitsOf(b * bits + t))
        (id, s"$b:$key")
      }
    }.toSet
    assert(got === want)
    assert(got.forall { case (_, bk) =>
      bk.split(":")(1).toLong < (1L << bits) })
    assert(got.size === vecs.size * bands)
  }

  test("bandCount ladder holds its recall floor at an INTERMEDIATE rung " +
      "(5-bit × 6 bands) no fixture or sf1 gate exercises") {
    // fixtures sit on the 4-bit rung and sf1 on the 8-bit one, so the
    // 5–7-bit rows of the BandCounts table would otherwise rest on the
    // analytic formula alone. Planted-neighbor corpus: 1,600 random
    // base vectors plus a jittered copy each (cosine clustered around
    // the 0.4–0.9 band), n = 3,200 ⇒ bandBits = 5, bandCount = 6.
    // Candidate recall of the true (cos ≥ 0.4) pairs through the same
    // codedBands kernel the gated keys use must clear the floor with
    // sampling slack (analytic 0.469 at the threshold; planted pairs
    // sit mostly above it, so measured lands higher — assert ≥ 0.4).
    val sess = spark
    import sess.implicits._
    val dims = 64
    val rnd = new scala.util.Random(64177)
    def unit(v: Array[Float]): Array[Float] = {
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      if (n == 0) v else v.map(x => (x / n).toFloat)
    }
    val bases = Array.fill(1600)(
      unit(Array.fill(dims)(rnd.nextGaussian().toFloat)))
    val jittered = bases.map { b =>
      val lam = 0.3 + 0.7 * rnd.nextDouble() // mix weight toward base
      val noise = unit(Array.fill(dims)(rnd.nextGaussian().toFloat))
      unit(Array.tabulate(dims)(i =>
        (lam * b(i) + (1 - lam) * noise(i)).toFloat))
    }
    val all = (bases ++ jittered).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }
    val n = all.length.toLong
    val bits = CorpusQueries.bandBits(n)
    assert(bits === 5, s"planted corpus must land on the 5-bit rung, n=$n")
    assert(CorpusQueries.bandCount(bits) === 6)
    def fdot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }; acc
    }
    // true neighbors: planted (base, jitter) pairs with cos >= 0.4 —
    // the driver-side exact set (cross-pair sims between unrelated
    // vectors concentrate near 0 at 64 dims, so planted pairs ARE the
    // ≥ 0.4 population; spot-checked by construction of lam)
    val truePairs = bases.indices.flatMap { i =>
      val c = fdot(bases(i), jittered(i)) // unit vectors: dot = cosine
      if (c >= 0.4) Some((i.toLong, (i + 1600).toLong, c)) else None
    }
    assert(truePairs.size > 400, s"need a real population: ${truePairs.size}")
    val df = all.toSeq.toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
    val bands = CorpusQueries.codedBands(df, bits)
      .select("vec_id", "bk").as[(Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val hit = truePairs.count { case (a, b, _) =>
      (bands(a) & bands(b)).nonEmpty
    }
    val recall = hit.toDouble / truePairs.size
    assert(recall >= 0.4,
      f"5-bit × 6-band recall $recall%.3f under the 0.4 floor " +
        f"(${truePairs.size} true pairs)")
  }

  test("embedBandIndexFrozen: probes read the width FROZEN in the table " +
      "name, never a re-derivation from the live count") {
    // the ADVICE r12 hazard: a corpus that crosses a ladder threshold
    // (2048, 4096, …) AFTER the index was persisted would code probes
    // at a wider width than the stored band keys and silently return
    // zero candidates. The freeze: the width lives in the table name
    // and an existing index of ANY width wins over the live ladder.
    val dir = "/root/testdata/sf0.001"
    val (tab1, bits1) =
      CorpusQueries.embedBandIndexFrozen(spark, dir, rebuild = true)
    assert(bits1 === CorpusQueries.embBandBits(spark, dir))
    assert(tab1.endsWith(s"_w$bits1"), s"width must be in the name: $tab1")
    // simulate the post-build ladder shift: persist a SECOND index
    // under the same session prefix at a DIFFERENT (wider) width, drop
    // the original — the next probe must pick up the stored width 9,
    // not re-derive the fixture ladder's 4
    val prefix = tab1.stripSuffix(s"_w$bits1")
    val emb = graft.Tables.tWide(spark, dir, "embeddings")
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("embedding"))
    graft.sources.Staging.storeBucketed(
      CorpusQueries.codedBands(emb, 9), s"${prefix}_w9", Seq("bk"), 8)
    spark.sql(s"DROP TABLE `$tab1`")
    val (tab2, bits2) = CorpusQueries.embedBandIndexFrozen(spark, dir)
    assert(tab2 === s"${prefix}_w9" && bits2 === 9,
      s"expected the frozen width 9, got ($tab2, $bits2)")
    // codedBands at the frozen width joins the stored keys: band keys
    // of the probe side must be drawn from the same (band, key) space
    val stored = spark.table(tab2)
      .select("bk").distinct().collect().map(_.getString(0)).toSet
    val probe = CorpusQueries.codedBands(emb.limit(5), bits2)
      .select("bk").collect().map(_.getString(0)).toSet
    assert(probe.subsetOf(stored) || (probe & stored).nonEmpty,
      "probe keys at the frozen width must land in the stored key space")
    // restore the session's natural index for any later test
    spark.sql(s"DROP TABLE `${prefix}_w9`")
    CorpusQueries.embedBandIndexFrozen(spark, dir, rebuild = true)
    ()
  }
}
