package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Unit evidence for the audit family (q124–q126) and the split ops
  * (q127/q128) beyond the DuckDB gate: the redaction completeness
  * invariant, profile-law checks on crafted nulls/duplicates, the
  * histogram-estimate error bound, and split totality/determinism. */
class AuditSpec extends SparkSpec {

  private def docsDf = {
    val sess = spark
    import sess.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (5L, "clean doc stays clean"), // % 5 == 0 → no PII appended
      (7L, "join scan filter merge"),
      (12L, "a b c d e f g")
    ).toDF("doc_id", "text")
  }

  test("q144: CMS laws — never undercounts corpus-wide, exact total, partition-invariant") {
    import graft.plans.CountMinAgg.count_min
    import graft.plans.GraftExpressions.poly_hash
    val dir = "/root/testdata/sf0.001"
    val toks = graft.Tables.tWide(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("tk"))
    def sketch(parts: Int): (Seq[Long], Long) = {
      val r = toks.repartition(parts)
        .agg(count_min(col("tk"), 4, 64).as("sk"))  // narrow width → real collisions
        .select(col("sk.cells"), col("sk.n")).head
      (r.getSeq[Long](0), r.getLong(1))
    }
    val (cells, n) = sketch(7)
    assert(n === toks.count(), "sketch n must be the exact token tally")
    assert(sketch(1)._1 === cells,
      "CMS is a linear transform of the counts — partitioning must not matter")
    // corpus-wide never-undercount: est(tk) >= true(tk) for EVERY token
    val cellsLit = typedlit(cells)
    val est = least((0 until 4).map { j =>
      element_at(cellsLit,
        (pmod(poly_hash(col("tk"), 131) + lit(j.toLong) * poly_hash(col("tk"), 137),
          lit(64L)) + lit(j * 64 + 1)).cast("int"))
    }: _*)
    val under = toks.groupBy("tk").agg(count(lit(1)).as("c"))
      .filter(est < col("c")).count()
    assert(under === 0L, "a CMS point estimate can never undercount")
    // row sums all equal n: every row of the sketch sees every item once
    (0 until 4).foreach { j =>
      assert(cells.slice(j * 64, (j + 1) * 64).sum === n,
        s"row $j cells must sum to n")
    }
  }

  test("q124: every synthesized digit lives inside a PII pattern — redaction leaves the payload digit-free") {
    val red = AuditQueries.piiRedact(docsDf)
    // re-derive the redacted string (piiRedact only ships its md5)
    val payload = AuditQueries.piiPayload(col("doc_id"), col("text"))
    val redTxt = docsDf.select(col("doc_id"),
      regexp_replace(regexp_replace(regexp_replace(payload,
        AuditQueries.EmailRe, "[EMAIL]"),
        AuditQueries.PhoneRe, "[PHONE]"),
        AuditQueries.IpRe, "[IP]").as("red"))
    val leftover = redTxt.filter(col("red").rlike("[0-9]")).count()
    assert(leftover === 0L,
      "digits surviving redaction = a PII pattern the regexes missed")
    val counts = red.orderBy("doc_id").collect()
    // non-exempt docs: exactly 2 emails, 1 phone, 1 ip; %5==0 doc: zero
    val byId = counts.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(byId(5L) === ((0L, 0L, 0L)), "clean doc must count zero PII")
    Seq(1L, 7L, 12L).foreach { id =>
      assert(byId(id) === ((2L, 1L, 1L)), s"doc $id PII counts")
    }
  }

  test("q125: profile laws on crafted nulls and duplicates") {
    val sess = spark
    import sess.implicits._
    val df = Seq[(Option[Long], String)](
      (Some(1L), "x"), (Some(2L), "y"), (Some(3L), null),
      (None, "x"), (Some(2L), "x")
    ).toDF("k", "s")
    val p = AuditQueries.profileTable(df, "t", Seq("k"), Seq("s"))
      .collect().map(r => r.getString(1) -> r).toMap
    val kRow = p("k"); val sRow = p("s")
    assert(kRow.getLong(2) === 5L && sRow.getLong(2) === 5L) // n_rows
    assert(kRow.getLong(3) === 1L, "k null count")
    assert(sRow.getLong(3) === 1L, "s null count")
    assert(kRow.getLong(4) === 3L, "k distinct ignores null: 1,2,3")
    assert(sRow.getLong(4) === 2L, "s distinct ignores null: x,y")
    assert(kRow.getDouble(5) === 1.0 && kRow.getDouble(6) === 3.0)
    assert(sRow.getString(7) === "x" && sRow.getString(8) === "y")
  }

  test("q126: histogram estimate is within ONE bucket width above the exact disc quantile") {
    val out = AuditQueries
      .quantileHistError(spark, "/root/testdata/sf0.001").collect()
    assert(out.length === 15, "5 event types x 3 quantiles")
    val ev = graft.Tables.loadEvents(spark, "/root/testdata/sf0.001")
      .agg(min("value"), max("value")).head()
    val width = (ev.getDouble(1) - ev.getDouble(0)) / AuditQueries.HistBuckets
    out.foreach { r =>
      val est = r.getDouble(2); val exact = r.getDouble(3)
      val err = r.getDouble(4)
      // both sides rank by the same cum*100 >= n*q rule, so the exact
      // disc value LIVES in the picked bucket and est is that bucket's
      // upper edge: 0 <= est - exact <= width (6-dp rounding dust)
      assert(est >= exact - 1e-6,
        s"${r.getString(0)} p${r.getLong(1)}: upper edge below exact")
      assert(err <= width + 1e-6,
        s"${r.getString(0)} p${r.getLong(1)}: err $err > width $width")
    }
  }

  test("q156: winsorization bounds obey q126's one-bucket contract; high tail capped at 1%") {
    val dir = "/root/testdata/sf0.001"
    val out = AuditQueries.winsorize(spark, dir).collect()
    val ev = graft.Tables.loadEvents(spark, dir)
    val mm = ev.agg(min("value"), max("value")).head()
    val width = (mm.getDouble(1) - mm.getDouble(0)) / AuditQueries.HistBuckets
    val byType = ev.select(col("event_type"), col("value")).collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    def exactDisc(vs: Array[Double], q: Int): Double =
      vs((math.ceil(vs.length * q / 100.0).toInt - 1).max(0))
    out.foreach { r =>
      val (t, lo, hi) = (r.getString(0), r.getDouble(1), r.getDouble(2))
      val (n, nLow, nHigh) = (r.getLong(3), r.getLong(4), r.getLong(5))
      assert(lo < hi, s"$t: bounds must be ordered")
      assert(nLow + nHigh < n, s"$t: the clip can never touch every row")
      val vs = byType(t)
      // each bound is its picked bucket's UPPER edge: within one bucket
      // width ABOVE the exact disc percentile (q126's proven law)
      assert(lo >= exactDisc(vs, 1) - 1e-6 &&
        lo <= exactDisc(vs, 1) + width + 1e-6,
        s"$t: p01 estimate $lo outside [exact, exact+width]")
      assert(hi >= exactDisc(vs, 99) - 1e-6 &&
        hi <= exactDisc(vs, 99) + width + 1e-6,
        s"$t: p99 estimate $hi outside [exact, exact+width]")
      // hi >= exact p99 ⇒ rows above hi ⊆ the true >p99 tail: ≤ 1% of n
      assert(nHigh <= math.floor(n * 0.01).toLong + 1,
        s"$t: p99 upper edge must cap the high tail at ~1%")
    }
  }

  test("q157: stratified quotas are EXACT integer cuts in every stratum") {
    val dir = "/root/testdata/sf0.001"
    val out = CorpusQueries
      .queries("q157_split_stratified")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val n = graft.Tables.t(spark, dir, "documents").count()
    assert(out.map(_._3).sum === n, "strata must partition the corpus")
    out.groupBy(_._1).foreach { case (src, rows) =>
      val by = rows.map(r => r._2 -> r._3).toMap
      val sn = rows.map(_._3).sum
      // rn·10 ≤ n·8 / ≤ n·9 cuts give EXACTLY floor(.8n) / floor(.9n)−floor(.8n) / rest
      assert(by("train") === sn * 8 / 10, s"$src train quota")
      assert(by("val") === sn * 9 / 10 - sn * 8 / 10, s"$src val quota")
      assert(by("test") === sn - sn * 9 / 10, s"$src test quota")
    }
  }

  test("q127: split assignment is total, deterministic, and near 80/10/10") {
    val docs = graft.Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val n = docs.count()
    val counts = docs
      .select(CorpusQueries.splitOf(col("doc_id")).as("split"))
      .groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum === n, "every doc gets exactly one split")
    val train = counts.getOrElse("train", 0L).toDouble / n
    assert(train > 0.7 && train < 0.9, s"train share $train far from 0.8")
    assert(counts.contains("val") && counts.contains("test"))
  }

  test("q129: repaired assignment leaves zero near-dup pairs straddling splits") {
    val sess = spark
    import sess.implicits._
    val dir = "/root/testdata/sf0.001"
    val docs = graft.Tables.tWide(spark, dir, "documents")
    val pairs = LlmQueries.minhashPairs(docs)
      .filter(col("match_cnt") >= LlmQueries.NearDupMinMatches)
      .select("doc_a", "doc_b")
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    // repaired split of a clustered doc = its canonical's split
    val repaired = GraphQueries
      .minLabel(spark, edges, GraphQueries.ClusterIters)
      .select(col("node"), CorpusQueries.splitOf(col("lbl")).as("split"))
    val residual = pairs
      .join(repaired.toDF("doc_a", "sa"), "doc_a")
      .join(repaired.toDF("doc_b", "sb"), "doc_b")
      .filter(col("sa") =!= col("sb")).count()
    assert(residual === 0L,
      "a pair's endpoints share a component, so repaired splits must agree")
  }

  test("q128: leakage matrix pair total equals the gated near-dup pair count") {
    val docs = graft.Tables.tWide(spark, "/root/testdata/sf0.001", "documents")
    val nPairs = LlmQueries.minhashPairs(docs)
      .filter(col("match_cnt") >= LlmQueries.NearDupMinMatches).count()
    val matrix = SparkEntryCall.q128(spark)
    assert(matrix.agg(sum("n_pairs")).head().getLong(0) === nPairs,
      "canonicalizing (lo, hi) must neither drop nor double-count pairs")
  }

  private object SparkEntryCall {
    def q128(s: org.apache.spark.sql.SparkSession) =
      graft.SparkEntry.queries("q128_split_leakage")(s, "/root/testdata/sf0.001")
  }

  test("q171: KS drift equals an exact driver-side ECDF scan") {
    val dir = "/root/testdata/sf0.001"
    val got = AuditQueries.queries("q171_ks_drift")(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getAs[Double]("ks_d"))).toMap
    val rows = graft.Tables.t(spark, dir, "documents")
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val n = rows.length.toLong
    val values = rows.map(_._2).distinct.sorted
    val expect = rows.groupBy(_._1).map { case (src, own) =>
      val n1 = own.length.toLong
      val dScaled = values.map { v =>
        val c1 = own.count(_._2 <= v).toLong
        val cAll = rows.count(_._2 <= v).toLong
        math.abs(c1 * (n - n1) - (cAll - c1) * n1)
      }.max
      src -> (n1, dScaled,
        BigDecimal(dScaled.toDouble / (n1 * (n - n1)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    assert(got === expect, "KS drift must equal the exact ECDF recompute")
    // and D is a proper statistic: bounded in [0, 1]
    got.values.foreach { case (_, _, d) => assert(d >= 0 && d <= 1) }
  }

  test("q197: PSI drift equals an exact driver-side decile recompute") {
    val dir = "/root/testdata/sf0.001"
    val got = AuditQueries.queries("q197_psi_drift")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getAs[Double]("psi")))
      .toMap
    val rows = graft.Tables.t(spark, dir, "documents")
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val B = AuditQueries.PsiBins
    val n = rows.length.toLong
    // pooled decile breakpoints: exact integer rank cuts over the
    // distinct value domain (same rule as the engine and the oracle)
    val cum = rows.map(_._2).groupBy(identity).toSeq.sortBy(_._1)
      .scanLeft((0L, 0L)) { case ((_, cc), (v, g)) => (v, cc + g.length) }
      .drop(1)
    val ts = (1 until B).map(k => cum.find(_._2 * B >= k * n).get._1)
    def bin(v: Long): Int = ts.count(v >= _)
    val expect = rows.groupBy(_._1).map { case (src, own) =>
      val n1 = own.length.toLong
      val n2 = n - n1
      val terms = (0 until B).map { b =>
        val c = own.count(r => bin(r._2) == b).toLong
        val d = rows.count(r => bin(r._2) == b).toLong - c
        if (c + d == 0L) 0.0
        else {
          val cA = math.max(c, 1L); val dA = math.max(d, 1L)
          (cA.toDouble / n1 - dA.toDouble / n2) *
            math.log((cA * n2).toDouble / (dA * n1).toDouble)
        }
      }
      src -> (n1,
        BigDecimal(terms.reduce(_ + _))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    assert(got === expect, "PSI must equal the exact decile recompute")
    // with the one-count ε-substitution every term is (x−y)·ln(x/y) ≥ 0
    got.values.foreach { case (_, psi) => assert(psi >= 0.0) }
  }

  test("q205: streamed per-batch PSI equals the exact frozen-baseline recompute") {
    val dir = "/root/testdata/sf0.001"
    val got = AuditQueries.queries("q205_stream_psi")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Double]("psi"))).toSeq
    val rows = graft.Tables.t(spark, dir, "documents")
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val B = AuditQueries.PsiBins
    val corpus = rows.filter(_._1 % 10 != 7).map(_._2)
    val n2 = corpus.length.toLong
    val cum = corpus.groupBy(identity).toSeq.sortBy(_._1)
      .scanLeft((0L, 0L)) { case ((_, cc), (v, g)) => (v, cc + g.length) }
      .drop(1)
    val ts = (1 until B).map(k => cum.find(_._2 * B >= k * n2).get._1)
    def bin(v: Long): Int = ts.count(v >= _)
    val cb = (0 until B).map(b => corpus.count(bin(_) == b).toLong)
    val expect = Seq(7L, 17L).map { pk =>
      val batch = rows.filter(_._1 % 20 == pk).map(_._2)
      val n1 = batch.length.toLong
      val terms = (0 until B).map { b =>
        val c = batch.count(bin(_) == b).toLong
        val d = cb(b)
        if (c + d == 0L) 0.0
        else {
          val cA = math.max(c, 1L); val dA = math.max(d, 1L)
          (cA.toDouble / n1 - dA.toDouble / n2) *
            math.log((cA * n2).toDouble / (dA * n1).toDouble)
        }
      }
      (pk, n1, BigDecimal(terms.reduce(_ + _))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    assert(got === expect,
      "per-batch PSI must equal the frozen-baseline exact recompute")
    // both micro-batches alarm-eligible: the fixture split is non-empty
    assert(got.map(_._2).forall(_ > 0L))
  }
}
