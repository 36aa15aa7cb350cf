package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Data-quality / audit family: PII redaction (q124), one-pass column
  * profiling (q125), histogram-quantile calibration against exact
  * percentiles (q126), and Count-Min-Sketch count calibration (q144)
  * — members #3 and #4 of the q122/q123 evaluation family.
  *
  * The reference pipeline (santoroc/appstore-aws-etl: `utils/utils/
  * s3.py` stages raw API payloads to S3, `utils/utils/secrets.py`
  * fetches warehouse credentials) has no audit stage at all; these
  * keys add the checks a pipeline at 100 TB cannot skip: what
  * leaked into the text, what the columns actually contain, and how far
  * the cheap quantile estimate sits from the exact answer it stands in
  * for.
  *
  * The fixture corpus is digit-free prose, so q124 synthesizes
  * deterministic PII-carrying payloads from (doc_id, text) — the q115
  * discipline: the INPUT is fabricated arithmetic both engines can
  * replay, the MACHINERY under test (regex scan, multi-pattern
  * redaction, count/verify pass) is the real thing.
  */
object AuditQueries {

  /** Portable regexes: Java (Spark) and RE2 (DuckDB) agree on these —
    * character classes, bounded repetition, and ASCII `\b` only; no
    * backreferences or lookaround (RE2 has neither). */
  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val PhoneRe = "\\b555-[0-9]{4}\\b"
  val IpRe = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** q124 payload: 4 of 5 docs get two emails, a phone, and an IPv4
    * appended, all derived from doc_id; every 5th doc stays clean so the
    * zero-match path is exercised under the gate. All synthesized digits
    * live INSIDE a PII pattern, so redaction must leave the payload
    * digit-free — the invariant AuditSpec pins. */
  def piiPayload(docId: Column, text: Column): Column =
    when(docId % 5 === 0, text).otherwise(concat(
      text,
      lit(" contact user"), docId.cast("string"),
      lit("@mail.example or admin-"), docId.cast("string"),
      lit("@graft.io, tel 555-"),
      lpad(((docId * 7919) % 10000).cast("string"), 4, "0"),
      lit(", host 10."), (docId % 256).cast("string"),
      lit(".0."), ((docId * 13) % 256).cast("string")))

  /** q124 core: count each PII class on the raw payload (the classes
    * can't overlap — emails here carry no digit-dot runs, phones no
    * dots), then redact emails → phones → IPs. Narrow, codegen'd
    * per-row work: one scan, zero shuffles until the presentation
    * sort. */
  def piiRedact(docs: DataFrame): DataFrame = {
    val payload = piiPayload(col("doc_id"), col("text"))
    docs.select(col("doc_id"), payload.as("payload"))
      .select(col("doc_id"),
        regexp_count(col("payload"), lit(EmailRe)).cast("long").as("n_emails"),
        regexp_count(col("payload"), lit(PhoneRe)).cast("long").as("n_phones"),
        regexp_count(col("payload"), lit(IpRe)).cast("long").as("n_ips"),
        regexp_replace(
          regexp_replace(
            regexp_replace(col("payload"), EmailRe, "[EMAIL]"),
            PhoneRe, "[PHONE]"),
          IpRe, "[IP]").as("red"))
      .select(col("doc_id"), col("n_emails"), col("n_phones"), col("n_ips"),
        md5(col("red")).as("red_md5"),
        length(col("red")).cast("long").as("red_len"))
  }

  /** q125: per-column profile rows from TWO plan shapes per table:
    * one map-combined agg for every non-distinct stat (count,
    * null-count, min/max — partial-aggregated to scalars before any
    * exchange), plus ONE SINGLE-DISTINCT agg per column for the exact
    * distinct count, unioned into a (col, n_distinct) sliver and
    * broadcast-joined back. The obvious alternative — all distincts in
    * one agg — plans as an Expand with |cols|·2+1 branches: every input
    * row is duplicated once per distinct column BEFORE the shuffle,
    * which is exactly the multiplier that kills a 100 TB profile pass
    * (and measured 15.1 s of q125's 16 s at sf1 on the 6-column events
    * table; this shape runs the same half in 1.3 s — each per-column
    * agg gets the two-phase partial-distinct plan over a column-PRUNED
    * scan, so the table's bytes are read once per column but never
    * row-multiplied, and columnar IO prices that at one column's
    * bytes, not the table's). Wide free-text columns (`digestCols`)
    * count distinct over the md5 DIGEST — same count (the q43
    * exact-dedup injectivity assumption), 16 bytes on the shuffle
    * instead of the document. Numeric columns report min/max as
    * rounded doubles, string columns lexicographically; the other
    * pair stays NULL. */
  def profileTable(df: DataFrame, tab: String,
      numCols: Seq[String], strCols: Seq[String],
      digestCols: Set[String] = Set.empty): DataFrame = {
    val all = numCols ++ strCols
    def dKey(c: String): Column =
      if (digestCols(c)) md5(col(c)) else col(c)
    val aggs: Seq[Column] =
      Seq(count(lit(1)).as("_rows")) ++
      all.map { c =>
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nnull") } ++
      numCols.flatMap { c => Seq(
        round(min(col(c)).cast("double"), 6).as(s"${c}_mn"),
        round(max(col(c)).cast("double"), 6).as(s"${c}_mx")) } ++
      strCols.flatMap { c => Seq(
        min(col(c)).as(s"${c}_mns"),
        max(col(c)).as(s"${c}_mxs")) }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val nd = all.map { c =>
        df.agg(countDistinct(dKey(c)).as("n_distinct"))
          .select(lit(c).as("col"), col("n_distinct"))
      }.reduce(_ unionByName _)
    val rows: Seq[Column] =
      numCols.map { c => struct(
        lit(tab).as("tab"), lit(c).as("col"),
        col("_rows").as("n_rows"), col(s"${c}_nnull").as("n_null"),
        col(s"${c}_mn").as("min_num"), col(s"${c}_mx").as("max_num"),
        lit(null).cast("string").as("min_str"),
        lit(null).cast("string").as("max_str")) } ++
      strCols.map { c => struct(
        lit(tab).as("tab"), lit(c).as("col"),
        col("_rows").as("n_rows"), col(s"${c}_nnull").as("n_null"),
        lit(null).cast("double").as("min_num"),
        lit(null).cast("double").as("max_num"),
        col(s"${c}_mns").as("min_str"), col(s"${c}_mxs").as("max_str")) }
    one.select(explode(array(rows: _*)).as("r")).select("r.*")
      .join(broadcast(nd), "col")
      .select(col("tab"), col("col"), col("n_rows"), col("n_null"),
        col("n_distinct"), col("min_num"), col("max_num"),
        col("min_str"), col("max_str"))
  }

  /** q197 bin count: the 10-decile convention PSI is defined over. */
  val PsiBins = 10

  /** q197 core: PSI of each source's n_chars distribution against the
    * rest of the corpus, over pooled-decile bins. Unordered — the gated
    * key applies the presentation sort. See the key's comment for the
    * determinism disciplines. */
  def psiDrift(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val B = PsiBins
    val d = docs.select(col("source"), col("n_chars"))
    val n = d.count()
    // pooled decile breakpoints: t_k = smallest value whose cumulative
    // count covers k/B of the pool (exact integer rank cut). The
    // single-partition window runs over the DISTINCT value domain —
    // metadata-scale, the q171 argument.
    val wAll = Window.orderBy("n_chars")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = d.groupBy("n_chars").agg(count(lit(1)).as("ct"))
      .withColumn("cc", sum("ct").over(wAll).cast("long"))
    val kdf = docs.sparkSession.range(1, B).toDF("k")
    val brk = cum.crossJoin(broadcast(kdf))
      .filter(col("cc") * B >= col("k") * n)
      .groupBy("k").agg(min("n_chars").as("t"))
    val brkArr = brk.agg(array_sort(collect_list("t")).as("ts"))
    val binned = d.crossJoin(broadcast(brkArr))
      .select(col("source"),
        size(filter(col("ts"), t => col("n_chars") >= t)).as("bin"))
    val cb = binned.groupBy("source", "bin").agg(count(lit(1)).as("c"))
    val tot = binned.groupBy("bin").agg(count(lit(1)).as("ct"))
    val n1 = binned.groupBy("source").agg(count(lit(1)).as("n1"))
    val bins = docs.sparkSession.range(0, B).toDF("bin")
    val cells = n1.crossJoin(broadcast(bins))
      .join(cb, Seq("source", "bin"), "left").na.fill(0L, Seq("c"))
      .join(broadcast(tot), Seq("bin"), "left").na.fill(0L, Seq("ct"))
      .withColumn("dcnt", col("ct") - col("c"))
      .withColumn("n2", lit(n) - col("n1"))
      .withColumn("cA", greatest(col("c"), lit(1L)))
      .withColumn("dA", greatest(col("dcnt"), lit(1L)))
      .withColumn("term",
        when(col("c") + col("dcnt") === 0L, lit(0.0))
          .otherwise(
            (col("cA").cast("double") / col("n1")
              - col("dA").cast("double") / col("n2"))
            * log((col("cA") * col("n2")).cast("double")
              / (col("dA") * col("n1")).cast("double"))))
    val perBin = (0 until B).map(b =>
      coalesce(sum(when(col("bin") === b, col("term"))), lit(0.0))
        .as(s"t_$b"))
    cells.groupBy("source", "n1")
      .agg(perBin.head, perBin.tail: _*)
      .select(col("source"), col("n1").as("n_docs"),
        round((0 until B).map(b => col(s"t_$b")).reduce(_ + _), 6)
          .as("psi"))
  }

  /** q126 histogram resolution. 64 buckets ⇒ estimate error is bounded
    * by the bucket width; the observed abs_err column quantifies it. */
  val HistBuckets = 64

  /** q126 core: equi-width-histogram quantile estimates vs the exact
    * DISCRETE quantile, per event_type. The histogram path is the
    * 100 TB shape — a min/max pass plus one bounded-key
    * (event_type × 64) count pass, both map-side combinable, no sort
    * anywhere; the exact side needs a full per-group sort and exists
    * precisely to CALIBRATE the cheap path before a run trusts it at
    * scale. BOTH sides rank by the same integer rule (count·100 ≥
    * total·q_pct — the ⌈q·n⌉-th order statistic), not an engine
    * percentile builtin: bucket pick and exact pick are then the same
    * arithmetic at two resolutions, both engines agree bit-for-bit,
    * and the estimate provably sits within ONE bucket width above the
    * exact value (AuditSpec pins the bound). An INTERPOLATED exact
    * side would break that bound: continuous quantiles land inside
    * data gaps, arbitrarily many empty buckets from the disc value. */
  def quantileHistError(s: SparkSession, dir: String): DataFrame = {
    val B = HistBuckets
    val ev = loadEvents(s, dir).select(col("event_type"), col("value"))
    val mm = ev.agg(min("value").as("mn"), max("value").as("mx"))
    val counts = ev.crossJoin(broadcast(mm))
      .select(col("event_type"),
        least(lit(B - 1L),
          floor((col("value") - col("mn")) / (col("mx") - col("mn")) * B))
          .cast("long").as("k"))
      .groupBy("event_type", "k").agg(count(lit(1)).as("cnt"))
    import org.apache.spark.sql.expressions.Window
    val byType = Window.partitionBy("event_type")
    val cum = counts
      .withColumn("cum", sum("cnt").over(byType.orderBy("k")))
      .withColumn("total", sum("cnt").over(byType))
    val qs = Seq(50L, 90L, 99L)
    val picked = cum
      .crossJoin(broadcast(
        mm.sparkSession.range(1).select(
          explode(array(qs.map(lit): _*)).as("q_pct"))))
      .filter(col("cum") * 100 >= col("total") * col("q_pct"))
      .groupBy("event_type", "q_pct").agg(min("k").as("ksel"))
    val est = picked.crossJoin(broadcast(mm))
      .select(col("event_type"), col("q_pct"),
        round(col("mn") +
          (col("ksel") + 1).cast("double") / B * (col("mx") - col("mn")), 6)
          .as("est"))
    val byTypeVal = Window.partitionBy("event_type").orderBy("value")
    val exact = ev
      .withColumn("rk", row_number().over(byTypeVal))
      .withColumn("n", count(lit(1)).over(byType))
      .crossJoin(broadcast(
        mm.sparkSession.range(1).select(
          explode(array(qs.map(lit): _*)).as("q_pct"))))
      .filter(col("rk") * 100 >= col("n") * col("q_pct"))
      .groupBy("event_type", "q_pct")
      .agg(round(min("value"), 6).as("exact"))
    est.join(exact, Seq("event_type", "q_pct"))
      .withColumn("abs_err", round(abs(col("est") - col("exact")), 6))
  }

  /** q156 core: histogram-estimated winsorization bounds — the outlier
    * clip every numeric-feature pipeline applies before training, in
    * the shape that survives 100 TB: p01/p99 come from q126's
    * equi-width histogram estimate (a global min/max pass + one
    * bounded-key (type × 64) count pass, both map-side combinable, NO
    * sort anywhere — exact-percentile clipping would sort every group;
    * q126 exists precisely to calibrate this estimate against exact),
    * then one more scan counts the rows the clip would touch. The
    * bounds ride UNROUNDED into the comparisons — both engines compute
    * the identical double by the identical op order (the q126
    * contract) — and round only for display. */
  def winsorize(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val B = HistBuckets
    val ev = loadEvents(s, dir).select(col("event_type"), col("value"))
    val mm = ev.agg(min("value").as("mn"), max("value").as("mx"))
    val counts = ev.crossJoin(broadcast(mm))
      .select(col("event_type"),
        least(lit(B - 1L),
          floor((col("value") - col("mn")) / (col("mx") - col("mn")) * B))
          .cast("long").as("k"))
      .groupBy("event_type", "k").agg(count(lit(1)).as("cnt"))
    val byType = Window.partitionBy("event_type")
    val cum = counts
      .withColumn("cum", sum("cnt").over(byType.orderBy("k")))
      .withColumn("total", sum("cnt").over(byType))
    val picked = cum
      .crossJoin(broadcast(
        mm.sparkSession.range(1).select(
          explode(array(lit(1L), lit(99L))).as("q_pct"))))
      .filter(col("cum") * 100 >= col("total") * col("q_pct"))
      .groupBy("event_type", "q_pct").agg(min("k").as("ksel"))
    val bnd = col("mn") +
      (col("ksel") + 1).cast("double") / B * (col("mx") - col("mn"))
    val bounds = picked.crossJoin(broadcast(mm))
      .groupBy("event_type")
      .agg(min(when(col("q_pct") === 1, bnd)).as("lo"),
        min(when(col("q_pct") === 99, bnd)).as("hi"))
    ev.join(broadcast(bounds), "event_type")
      .groupBy("event_type")
      .agg(round(min("lo"), 6).as("p01_est"),
        round(min("hi"), 6).as("p99_est"),
        count(lit(1)).as("n"),
        count(when(col("value") < col("lo"), 1)).as("n_low"),
        count(when(col("value") > col("hi"), 1)).as("n_high"))
  }

  /** q144 sketch shape: 4 rows × 1024 buckets = 32 KB, fixed. */
  private val CmsDepth = 4
  private val CmsWidth = 1024

  /** q144 core: one CMS pass over the token stream (the CountMinAgg
    * scaladoc's 100 TB story — fixed 32 KB partials, map-side combined,
    * merged by addition), sketch collected driver-side (metadata-scale,
    * the q98 Bloom-collect class), then the top-20 exact tokens score
    * est vs true. The estimate is pure codegen arithmetic against the
    * sketch-as-literal: both PolyHash folds + Kirsch–Mitzenmacher
    * double hashing + least() over the row cells — no second shuffle
    * beyond the exact count's own. CMS never undercounts, so
    * `overcount` = est − true ≥ 0 is a structural invariant (AuditSpec
    * pins it corpus-wide; the oracle pins the exact cell values). */
  def cmsError(s: SparkSession, dir: String): DataFrame = {
    import graft.plans.CountMinAgg.count_min
    val toks = docTokens(s, dir)
    val cells = toks.agg(count_min(col("tk"), CmsDepth, CmsWidth).as("sk"))
      .select(col("sk.cells")).head().getSeq[Long](0)
    cmsTop20(toks, cells)
  }

  private def docTokens(s: SparkSession, dir: String): DataFrame =
    tWide(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tk"))

  /** The q144 reporting stage against ANY sketch cell vector: exact
    * top-20 token counts scored with the min-of-row-cells estimate. */
  private def cmsTop20(toks: DataFrame, cells: Seq[Long]): DataFrame = {
    import graft.plans.GraftExpressions.poly_hash
    val cellsLit = typedlit(cells)
    val h1 = poly_hash(col("token"), 131)
    val h2 = poly_hash(col("token"), 137)
    val est = least((0 until CmsDepth).map { j =>
      element_at(cellsLit,
        (pmod(h1 + lit(j.toLong) * h2, lit(CmsWidth.toLong)) +
          lit(j * CmsWidth + 1)).cast("int"))
    }: _*)
    toks.groupBy(col("tk").as("token"))
      .agg(count(lit(1)).as("true_cnt"))
      .orderBy(desc("true_cnt"), col("token")).limit(20)
      .select(col("token"), col("true_cnt"), est.as("est_cnt"),
        (est - col("true_cnt")).as("overcount"))
      .orderBy(desc("true_cnt"), col("token"))
  }

  /** q148: q144's answer reached through the GROW lifecycle — the
    * q113/q134/q136 append≡rebuild discipline applied to the sketch
    * family. A long-lived counter service never resketches its corpus:
    * each ingest epoch sketches itself and the service ADDS cell
    * vectors (CMS is linear in the count vector — the mergeable-
    * summaries property CountMinAgg's merge() implements, here
    * exercised ACROSS separate aggregations, not within one). Epochs
    * split on doc_id (%10 = 3 is the q134 ingest class); the oracle is
    * q144's twin VERBATIM, making the gate the grown ≡ one-shot
    * equivalence proof. */
  def cmsGrow(s: SparkSession, dir: String): DataFrame = {
    import graft.plans.CountMinAgg.count_min
    val toks = docTokens(s, dir)
    def cellsOf(epoch: DataFrame): Seq[Long] =
      epoch.agg(count_min(col("tk"), CmsDepth, CmsWidth).as("sk"))
        .select(col("sk.cells")).head().getSeq[Long](0)
    val base = cellsOf(toks.filter(col("doc_id") % 10 =!= 3))
    val delta = cellsOf(toks.filter(col("doc_id") % 10 === 3))
    val grown = base.zip(delta).map { case (a, b) => a + b }
    cmsTop20(toks, grown)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // PII redaction audit: multi-pattern counts + redacted-text digest.
    "q124_pii_redact" -> { (s, dir) =>
      piiRedact(tWide(s, dir, "documents")).orderBy("doc_id")
    },

    // One-pass-per-table column profile of documents + events. events.ts
    // IS profiled, as `ts_us` = epoch micros (a long): loadEvents yields
    // a true TimestampType either fixture encoding (D9), and profiling
    // the integer instant rather than a formatted timestamp keeps the
    // min/max surface engine-renderer-independent.
    "q125_profile" -> { (s, dir) =>
      profileTable(t(s, dir, "documents"), "documents",
          numCols = Seq("doc_id", "n_chars"),
          strCols = Seq("text", "lang", "source"),
          digestCols = Set("text"))
        .unionByName(profileTable(
          loadEvents(s, dir).withColumn("ts_us", unix_micros(col("ts"))),
          "events",
          numCols = Seq("event_id", "user_id", "value", "ts_us"),
          strCols = Seq("event_type", "props"),
          digestCols = Set("props")))
        .orderBy("tab", "col")
    },

    // Histogram-quantile calibration (evaluation family #3).
    "q126_quantile_hist_error" -> { (s, dir) =>
      quantileHistError(s, dir).orderBy("event_type", "q_pct")
    },

    // Count-Min Sketch calibration (evaluation family #4): the sketch
    // every streaming counter service actually ships, measured against
    // exact counts on the same corpus.
    "q144_cms_error" -> { (s, dir) => cmsError(s, dir) },

    // The q144 sketch grown epoch-by-epoch; oracle is q144's twin
    // verbatim — the gate IS the grown ≡ one-shot equivalence proof.
    "q148_cms_grow" -> { (s, dir) => cmsGrow(s, dir) },

    // Histogram-estimated winsorization — outlier clipping without a
    // sort (rationale at [[winsorize]]).
    "q156_winsorize" -> { (s, dir) =>
      winsorize(s, dir).orderBy("event_type")
    },

    // DISTRIBUTION DRIFT — two-sample Kolmogorov–Smirnov D per source
    // (its n_chars distribution vs the REST of the corpus): the
    // data-quality alarm that fires when one feed starts shipping
    // different-shaped documents (truncation, boilerplate injection)
    // even though its volume looks normal. ALL-INTEGER: D's numerator
    // max|c1·n2 − c2·n1| is exact int64 over cumulative counts — the
    // supremum is attained at a step of either ECDF, so scanning every
    // distinct n_chars value is exhaustive, not a sample. Width bound
    // (the q166 discipline): the products stay inside int64 while
    // n1·n2 < 2⁶³, i.e. up to ~3e9 docs per side — beyond that,
    // switch the numerator to DECIMAL(38,0) partials; the plan shape
    // is unchanged. Shapes: one
    // bounded (source × value) count, a sources × values grid
    // (domain-bounded: |values| ≤ max doc length, never corpus-sized),
    // per-source cumulative windows, and ONE single-partition window
    // over the distinct-VALUE domain for the pooled ECDF — metadata-
    // scale by the same argument as q126's histogram. The final D
    // divides exact longs once, rounded for display.
    // POPULATION STABILITY INDEX per source — the binned drift score
    // model monitoring actually reports, complementing q171's KS
    // sup-norm with interpretable per-bin contributions: PSI =
    // Σ (p_i − q_i)·ln(p_i/q_i) over the pooled distribution's 10
    // decile bins, each source vs the REST of the corpus. Disciplines
    // compose: decile breakpoints are exact integer rank cuts over the
    // pooled value domain (q181 — every breakpoint is a value that
    // exists); bin membership is a 9-comparison fold against the
    // broadcast breakpoint array; every (source, bin) cell is ONE row
    // so the conditional per-bin sums have a single element each (the
    // q93 rule) and the final PSI folds the 10 bin terms in fixed bin
    // order — no shuffle-order double sum anywhere. Zero cells use the
    // standard ε-substitution at one COUNT (greatest(c,1)) so ln stays
    // finite, a both-sides-empty bin contributes exactly 0, and each
    // term is (x−y)·ln(x/y) ≥ 0. Width bound (q171's rule): the int64
    // products c·n2 stay exact while n² < 2⁶³, i.e. ~3e9 docs.
    "q197_psi_drift" -> { (s, dir) =>
      psiDrift(t(s, dir, "documents")).orderBy("source")
    },

    "q171_ks_drift" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val d = t(s, dir, "documents").select(col("source"), col("n_chars"))
      val n = d.count()
      val pc = d.groupBy("source", "n_chars").agg(count(lit(1)).as("c"))
      val srcN = d.groupBy("source").agg(count(lit(1)).as("n1"))
      val values = d.select("n_chars").distinct()
      // srcN is bounded by SOURCE CARDINALITY (a handful of corpus
      // sources at any SF); values is the data-sized distinct grid —
      // broadcast the bounded side explicitly, don't let the estimator
      // size a post-agg frame from the documents scan.
      val grid = broadcast(srcN).crossJoin(values)
      val wSrc = Window.partitionBy("source").orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val c1 = grid.join(pc, Seq("source", "n_chars"), "left")
        .na.fill(0L, Seq("c"))
        .withColumn("c1", sum("c").over(wSrc).cast("long"))
      val wAll = Window.orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cumTot = d.groupBy("n_chars").agg(count(lit(1)).as("ct"))
        .withColumn("ctc", sum("ct").over(wAll).cast("long"))
        .select("n_chars", "ctc")
      c1.join(cumTot, "n_chars")
        .withColumn("c2", col("ctc") - col("c1"))
        .withColumn("n2", lit(n) - col("n1"))
        .groupBy("source")
        .agg(max(col("n1")).cast("long").as("n_docs"), // constant per source
          max(abs(col("c1") * col("n2") - col("c2") * col("n1")))
            .cast("long").as("d_scaled"))
        .select(col("source"), col("n_docs"), col("d_scaled"),
          round(col("d_scaled").cast("double")
            / (col("n_docs") * (lit(n) - col("n_docs"))), 6).as("ks_d"))
        .orderBy("source")
    },

    // q171's drift alarm as a TRUE STREAM — the ingest-time shape
    // check an always-on pipeline runs per micro-batch: each arriving
    // batch's n_chars ECDF tests against the STATIC corpus baseline
    // (two-sample KS, the same exact-integer supremum and the same
    // ~3e9-per-side int64 width bound), and one alarm
    // row per batch appends to the sink. Stateless per batch — no
    // state store; the per-batch work is windows over the bounded
    // value DOMAIN (the q171 metadata-scale argument), with the
    // corpus baseline computed once and reused across batches.
    // Batches identify by CONTENT (min(doc_id % 20)), never by
    // trigger order, so the answer is staging-order-free and the
    // oracle replays each batch by its membership (the q108
    // discipline).
    "q174_stream_ks_drift" -> { (s, dir) =>
      import graft.streaming.EventQueries.{freshBase, stageBatches}
      import org.apache.spark.sql.expressions.Window
      val base = freshBase(s, dir, "q174")
      val docs = t(s, dir, "documents").select("doc_id", "n_chars")
      val corpus = docs.filter(col("doc_id") % 10 =!= 7)
      val cc = corpus.groupBy("n_chars").agg(count(lit(1)).as("ct")).cache()
      val n2 = corpus.count()
      val batchDocs = docs.filter(col("doc_id") % 10 === 7)
      val src = stageBatches(s, base, Seq(
        batchDocs.filter(col("doc_id") % 20 === 7),
        batchDocs.filter(col("doc_id") % 20 === 17)))
      val outDir = s"$base/out"
      graft.Tables.withShufflePartitions(s, 8) {
        val stream = s.readStream.schema("doc_id BIGINT, n_chars BIGINT")
          .option("maxFilesPerTrigger", 1).parquet(src)
        val q = stream.writeStream
          .option("checkpointLocation", s"$base/ckpt")
          .foreachBatch { (batch: DataFrame, bid: Long) =>
            batch.persist()
            // finally: a storeBatch failure (e.g. the loud batch-key
            // collision guard) must not leak the persisted batch into
            // the retrying stream
            try {
              val n1 = batch.count()
              if (n1 > 0) {
                val key = batch
                  .agg(min(pmod(col("doc_id"), lit(20L)))).head().getLong(0)
                val bc = batch.groupBy("n_chars").agg(count(lit(1)).as("bt"))
                val grid = cc.select("n_chars")
                  .union(bc.select("n_chars")).distinct()
                val w = Window.orderBy("n_chars")
                  .rowsBetween(Window.unboundedPreceding, Window.currentRow)
                // idempotent sink: the content-derived key is stable
                // across replays, so a retried batch overwrites its own
                // alarm row instead of double-appending it
                graft.sources.Staging.storeBatch(
                  grid
                    .join(bc, Seq("n_chars"), "left").na.fill(0L, Seq("bt"))
                    .join(cc, Seq("n_chars"), "left").na.fill(0L, Seq("ct"))
                    .withColumn("c1", sum("bt").over(w).cast("long"))
                    .withColumn("c2", sum("ct").over(w).cast("long"))
                    .agg(max(abs(col("c1") * n2 - col("c2") * n1))
                      .cast("long").as("d_scaled"))
                    .select(lit(key).as("batch_key"),
                      lit(n1).as("n_batch"), col("d_scaled"),
                      round(col("d_scaled").cast("double") / lit(n1 * n2), 6)
                        .as("ks_d")),
                  outDir, key, bid)
              }
            } finally batch.unpersist()
            ()
          }
          .start()
        try q.processAllAvailable() finally q.stop()
      }
      graft.sources.Staging.readBatchSink(s, outDir,
          "batch_key BIGINT, n_batch BIGINT, d_scaled BIGINT, ks_d DOUBLE")
        .orderBy("batch_key")
    },

    // q197's PSI as a TRUE STREAM — the binned-drift alarm an always-on
    // ingest runs per micro-batch, completing the drift family's
    // symmetry (q171 KS batch ↔ q174 KS stream; q197 PSI batch ↔ this).
    // Unlike q197 (pooled deciles, each source vs the rest), the
    // streaming shape freezes the BASELINE: the standing corpus
    // (doc_id % 10 ≠ 7) fixes its decile cuts and per-bin counts ONCE —
    // 9 + 10 + 1 values, the metadata-scale class of q98's collected
    // sketch — and every arriving batch bins against those frozen cuts.
    // Batch-side work is distributed (a 9-comparison bin projection +
    // one bounded-key count agg); only the 10-term fold runs on the
    // driver, on pre-aggregated counts, in the exact q197 term
    // arithmetic and fixed bin order the oracle replays. Batches
    // identify by CONTENT (min(doc_id % 20)), the sink is the
    // idempotent storeBatch, and the oracle replays each batch by its
    // %20 membership (the q108/q174 discipline).
    "q205_stream_psi" -> { (s, dir) =>
      import graft.streaming.EventQueries.{freshBase, stageBatches}
      val base = freshBase(s, dir, "q205")
      val batchDocs = t(s, dir, "documents").select("doc_id", "n_chars")
        .filter(col("doc_id") % 10 === 7)
      val src = stageBatches(s, base, Seq(
        batchDocs.filter(col("doc_id") % 20 === 7),
        batchDocs.filter(col("doc_id") % 20 === 17)))
      val outDir = s"$base/out"
      psiStream(s, dir, src, outDir, s"$base/ckpt")
      graft.sources.Staging.readBatchSink(s, outDir,
          "batch_key BIGINT, n_batch BIGINT, psi DOUBLE")
        .orderBy("batch_key")
    },
  )

  /** q205 machinery — the frozen-baseline build plus one run of the
    * PSI stream over whatever is currently staged under `src`: shared
    * by the gated key (one run, both batches staged) and StreamingSpec's
    * checkpoint-recovery law (kill between batches, restart from the
    * same checkpoint). The baseline (decile cuts + per-bin counts,
    * 9+10+1 values — metadata-scale, the q98 sketch-collect class) is
    * a pure function of the standing corpus, so a restarted job
    * recomputes the identical frozen cuts — exactly what a production
    * restart does when it reloads its baseline. */
  private[graft] def psiStream(s: SparkSession, dir: String, src: String,
      outDir: String, ckpt: String): Unit = {
    import org.apache.spark.sql.expressions.Window
    val B = PsiBins
    val docs = t(s, dir, "documents").select("doc_id", "n_chars")
    val corpus = docs.filter(col("doc_id") % 10 =!= 7)
    val n2 = corpus.count()
    val wAll = Window.orderBy("n_chars")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = corpus.groupBy("n_chars").agg(count(lit(1)).as("ct"))
      .withColumn("cc", sum("ct").over(wAll).cast("long"))
    val ts = cum.crossJoin(broadcast(s.range(1, B).toDF("k")))
      .filter(col("cc") * B >= col("k") * n2)
      .groupBy("k").agg(min("n_chars").as("t"))
      .orderBy("k").collect().map(_.getLong(1)).toSeq
    def binOf(c: Column): Column =
      ts.map(t => when(c >= t, 1).otherwise(0)).reduce(_ + _).cast("long")
    val cbMap = corpus.select(binOf(col("n_chars")).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("d"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cbArr = (0 until B).map(b => cbMap.getOrElse(b.toLong, 0L))
    // the q197 term arithmetic, verbatim, over frozen baseline counts
    def psiOf(c: IndexedSeq[Long], n1: Long): Double = {
      val terms = (0 until B).map { b =>
        val cA = math.max(c(b), 1L); val dA = math.max(cbArr(b), 1L)
        if (c(b) + cbArr(b) == 0L) 0.0
        else (cA.toDouble / n1 - dA.toDouble / n2) *
          math.log((cA * n2).toDouble / (dA * n1).toDouble)
      }
      BigDecimal(terms.reduce(_ + _))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    graft.Tables.withShufflePartitions(s, 8) {
      val stream = s.readStream.schema("doc_id BIGINT, n_chars BIGINT")
        .option("maxFilesPerTrigger", 1).parquet(src)
      val q = stream.writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: DataFrame, bid: Long) =>
          batch.persist()
          // finally: a storeBatch failure (e.g. the loud batch-key
          // collision guard) must not leak the persisted batch into
          // the retrying stream
          try {
            val n1 = batch.count()
            if (n1 > 0) {
              val key = batch
                .agg(min(pmod(col("doc_id"), lit(20L)))).head().getLong(0)
              val bcMap = batch.select(binOf(col("n_chars")).as("bin"))
                .groupBy("bin").agg(count(lit(1)).as("c"))
                .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
              val c = (0 until B).map(b => bcMap.getOrElse(b.toLong, 0L))
              graft.sources.Staging.storeBatch(
                batch.sparkSession.range(1).select(
                  lit(key).as("batch_key"), lit(n1).as("n_batch"),
                  lit(psiOf(c, n1)).as("psi")),
                outDir, key, bid)
            }
          } finally batch.unpersist()
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
  }

  /** DuckDB twin of one profileTable call (same agg expressions, one
    * UNION ALL arm per column). `from` lets a derived table stand in
    * for the raw one (events adds ts_us) while `tab` stays the
    * reported table name. */
  private def profileSql(tab: String, numCols: Seq[String],
      strCols: Seq[String], from: String = ""): String = {
    val src = if (from.isEmpty) tab else from
    val all = numCols ++ strCols
    val aggExprs =
      Seq("count(*) AS _rows") ++
      all.flatMap { c => Seq(
        s"CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS ${c}_nnull",
        s"count(DISTINCT $c) AS ${c}_nd") } ++
      numCols.flatMap { c => Seq(
        s"round(CAST(min($c) AS DOUBLE), 6) AS ${c}_mn",
        s"round(CAST(max($c) AS DOUBLE), 6) AS ${c}_mx") } ++
      strCols.flatMap { c => Seq(
        s"min($c) AS ${c}_mns", s"max($c) AS ${c}_mxs") }
    val arms =
      numCols.map { c =>
        s"SELECT '$tab' AS tab, '$c' AS col, _rows AS n_rows, ${c}_nnull AS n_null, ${c}_nd AS n_distinct, ${c}_mn AS min_num, ${c}_mx AS max_num, NULL::VARCHAR AS min_str, NULL::VARCHAR AS max_str FROM a_$tab" } ++
      strCols.map { c =>
        s"SELECT '$tab', '$c', _rows, ${c}_nnull, ${c}_nd, NULL::DOUBLE, NULL::DOUBLE, ${c}_mns, ${c}_mxs FROM a_$tab" }
    s"a_$tab AS (SELECT ${aggExprs.mkString(", ")} FROM $src)," +
      s" rows_$tab AS (${arms.mkString(" UNION ALL ")})"
  }

  def oracle: Map[String, String] = Map(
    "q124_pii_redact" ->
      """WITH p AS (
        |  SELECT doc_id, CASE WHEN doc_id % 5 = 0 THEN text ELSE
        |    text || ' contact user' || doc_id::VARCHAR
        |      || '@mail.example or admin-' || doc_id::VARCHAR
        |      || '@graft.io, tel 555-'
        |      || lpad(((doc_id * 7919) % 10000)::VARCHAR, 4, '0')
        |      || ', host 10.' || (doc_id % 256)::VARCHAR
        |      || '.0.' || ((doc_id * 13) % 256)::VARCHAR END AS payload
        |  FROM documents),
        |r AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(payload, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) AS n_emails,
        |    CAST(len(regexp_extract_all(payload, '\b555-[0-9]{4}\b')) AS BIGINT) AS n_phones,
        |    CAST(len(regexp_extract_all(payload, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS BIGINT) AS n_ips,
        |    regexp_replace(regexp_replace(regexp_replace(payload,
        |      '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '[EMAIL]', 'g'),
        |      '\b555-[0-9]{4}\b', '[PHONE]', 'g'),
        |      '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '[IP]', 'g') AS red
        |  FROM p)
        |SELECT doc_id, n_emails, n_phones, n_ips,
        |  md5(red) AS red_md5, CAST(length(red) AS BIGINT) AS red_len
        |FROM r ORDER BY doc_id""".stripMargin,

    "q125_profile" -> {
      val d = profileSql("documents",
        Seq("doc_id", "n_chars"), Seq("text", "lang", "source"))
      val e = profileSql("events",
        Seq("event_id", "user_id", "value", "ts_us"),
        Seq("event_type", "props"),
        from = "(SELECT *, CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT)" +
          " AS ts_us FROM events)")
      s"""WITH $d, $e
         |SELECT * FROM rows_documents
         |UNION ALL SELECT * FROM rows_events
         |ORDER BY tab, col""".stripMargin
    },

    "q126_quantile_hist_error" ->
      s"""WITH mm AS (SELECT min(value) AS mn, max(value) AS mx FROM events),
         |c AS (
         |  SELECT event_type,
         |    CAST(least(${HistBuckets - 1},
         |      floor((value - mn) / (mx - mn) * $HistBuckets)) AS BIGINT) AS k,
         |    count(*) AS cnt
         |  FROM events, mm GROUP BY event_type, k, mn, mx),
         |cum AS (
         |  SELECT event_type, k, cnt,
         |    sum(cnt) OVER (PARTITION BY event_type ORDER BY k) AS cum,
         |    sum(cnt) OVER (PARTITION BY event_type) AS total
         |  FROM c),
         |picked AS (
         |  SELECT event_type, q_pct, min(k) AS ksel
         |  FROM cum CROSS JOIN (SELECT unnest([50, 90, 99]) AS q_pct) q
         |  WHERE cum * 100 >= total * q_pct
         |  GROUP BY event_type, q_pct),
         |est AS (
         |  SELECT event_type, CAST(q_pct AS BIGINT) AS q_pct,
         |    round(mn + CAST(ksel + 1 AS DOUBLE) / $HistBuckets * (mx - mn), 6) AS est
         |  FROM picked, mm),
         |rk AS (
         |  SELECT event_type, value,
         |    row_number() OVER (PARTITION BY event_type ORDER BY value) AS rk,
         |    count(*) OVER (PARTITION BY event_type) AS n
         |  FROM events),
         |ex AS (
         |  SELECT event_type, CAST(q_pct AS BIGINT) AS q_pct,
         |    round(min(value), 6) AS exact
         |  FROM rk CROSS JOIN (SELECT unnest([50, 90, 99]) AS q_pct) q
         |  WHERE rk * 100 >= n * q_pct
         |  GROUP BY event_type, q_pct)
         |SELECT event_type, q_pct, est, exact,
         |  round(abs(est - exact), 6) AS abs_err
         |FROM est JOIN ex USING (event_type, q_pct)
         |ORDER BY event_type, q_pct""".stripMargin,

    // q156: q126's histogram CTEs restricted to q ∈ {1, 99}, bounds
    // compared UNROUNDED (identical doubles by identical op order)
    "q156_winsorize" ->
      s"""WITH mm AS (SELECT min(value) AS mn, max(value) AS mx FROM events),
         |c AS (
         |  SELECT event_type,
         |    CAST(least(${HistBuckets - 1},
         |      floor((value - mn) / (mx - mn) * $HistBuckets)) AS BIGINT) AS k,
         |    count(*) AS cnt
         |  FROM events, mm GROUP BY event_type, k, mn, mx),
         |cum AS (
         |  SELECT event_type, k, cnt,
         |    sum(cnt) OVER (PARTITION BY event_type ORDER BY k) AS cum,
         |    sum(cnt) OVER (PARTITION BY event_type) AS total
         |  FROM c),
         |picked AS (
         |  SELECT event_type, q_pct, min(k) AS ksel
         |  FROM cum CROSS JOIN (SELECT unnest([1, 99]) AS q_pct) q
         |  WHERE cum * 100 >= total * q_pct
         |  GROUP BY event_type, q_pct),
         |bounds AS (
         |  SELECT event_type,
         |    min(CASE WHEN q_pct = 1 THEN mn + CAST(ksel + 1 AS DOUBLE) / $HistBuckets * (mx - mn) END) AS lo,
         |    min(CASE WHEN q_pct = 99 THEN mn + CAST(ksel + 1 AS DOUBLE) / $HistBuckets * (mx - mn) END) AS hi
         |  FROM picked, mm GROUP BY event_type)
         |SELECT e.event_type, round(min(lo), 6) AS p01_est,
         |  round(min(hi), 6) AS p99_est, count(*) AS n,
         |  count(*) FILTER (value < lo) AS n_low,
         |  count(*) FILTER (value > hi) AS n_high
         |FROM events e JOIN bounds b USING (event_type)
         |GROUP BY e.event_type ORDER BY event_type""".stripMargin,

    // q144: DuckDB reconstructs the ENTIRE sketch in SQL — the CMS cell
    // vector is a deterministic linear function of the exact counts
    // under the portable double-hash rule, so est = min-of-row-cells is
    // value-for-value comparable (both PolyHash folds replayed per
    // token, as in q81/q140)
    "q144_cms_error" -> CmsSql,

    // q148 = q144's answer from the epoch-grown sketch; same SQL, and
    // the gate becomes the sketch-linearity equivalence proof (the
    // q134/q136 twin-sharing discipline)
    "q148_cms_grow" -> CmsSql,

    // q171: the same exact-integer ECDF scan — every distinct value is
    // a grid point, cumulative counts in int64, one division at the end
    "q171_ks_drift" ->
      """WITH d AS (SELECT source, n_chars FROM documents),
        |n AS (SELECT count(*) AS n FROM d),
        |pc AS (SELECT source, n_chars, count(*) AS c
        |       FROM d GROUP BY source, n_chars),
        |srcn AS (SELECT source, count(*) AS n1 FROM d GROUP BY source),
        |vals AS (SELECT DISTINCT n_chars FROM d),
        |grid AS (SELECT s.source, s.n1, v.n_chars
        |         FROM srcn s CROSS JOIN vals v),
        |c1 AS (
        |  SELECT g.source, g.n1, g.n_chars,
        |    CAST(sum(COALESCE(pc.c, 0)) OVER (PARTITION BY g.source
        |      ORDER BY g.n_chars) AS BIGINT) AS c1
        |  FROM grid g LEFT JOIN pc
        |    ON pc.source = g.source AND pc.n_chars = g.n_chars),
        |ct AS (
        |  SELECT n_chars,
        |    CAST(sum(count(*)) OVER (ORDER BY n_chars) AS BIGINT) AS ctc
        |  FROM d GROUP BY n_chars)
        |SELECT source, CAST(max(n1) AS BIGINT) AS n_docs,
        |  CAST(max(abs(c1 * (n - n1) - (ctc - c1) * n1)) AS BIGINT)
        |    AS d_scaled,
        |  round(CAST(max(abs(c1 * (n - n1) - (ctc - c1) * n1)) AS BIGINT)
        |    ::DOUBLE / (max(n1) * (max(n) - max(n1))), 6) AS ks_d
        |FROM c1 JOIN ct USING (n_chars) CROSS JOIN n
        |GROUP BY source ORDER BY source""".stripMargin,

    // q197: the same exact-integer disciplines as q171, composed — the
    // decile breakpoints are integer rank cuts over the pooled
    // cumulative counts (cc·10 ≥ k·n picks the smallest covering
    // value), bin membership counts breakpoints ≤ n_chars, every
    // (source, bin) cell is ONE row so the per-bin MIN(CASE…) each
    // select a single term, and the final PSI folds t_0..t_9 in the
    // same fixed bin order as the Spark side's left-to-right reduce.
    "q197_psi_drift" -> {
      val B = PsiBins
      val pivotCols = (0 until B).map(b =>
        s"COALESCE(min(CASE WHEN bin = $b THEN term END), 0.0) AS t_$b")
        .mkString(",\n        |    ")
      val foldSum = (0 until B).map(b => s"t_$b").mkString(" + ")
      s"""WITH d AS (SELECT source, n_chars FROM documents),
         |nn AS (SELECT count(*) AS n FROM d),
         |cum AS (
         |  SELECT n_chars,
         |    CAST(sum(count(*)) OVER (ORDER BY n_chars) AS BIGINT) AS cc
         |  FROM d GROUP BY n_chars),
         |brk AS (
         |  SELECT k, min(n_chars) AS t
         |  FROM cum CROSS JOIN (SELECT unnest(range(1, $B)) AS k) kk
         |    CROSS JOIN nn
         |  WHERE cc * $B >= k * n
         |  GROUP BY k),
         |binned AS (
         |  SELECT dd.source,
         |    (SELECT count(*) FROM brk WHERE dd.n_chars >= brk.t) AS bin
         |  FROM d dd),
         |cb AS (SELECT source, bin, count(*) AS c
         |       FROM binned GROUP BY source, bin),
         |tot AS (SELECT bin, count(*) AS ct FROM binned GROUP BY bin),
         |srcn AS (SELECT source, count(*) AS n1 FROM d GROUP BY source),
         |cells AS (
         |  SELECT s.source, s.n1, b.bin,
         |    COALESCE(cb.c, 0) AS c, COALESCE(tot.ct, 0) - COALESCE(cb.c, 0) AS dcnt
         |  FROM srcn s
         |  CROSS JOIN (SELECT unnest(range(0, $B)) AS bin) b
         |  LEFT JOIN cb ON cb.source = s.source AND cb.bin = b.bin
         |  LEFT JOIN tot ON tot.bin = b.bin),
         |terms AS (
         |  SELECT source, n1, bin,
         |    CASE WHEN c + dcnt = 0 THEN 0.0 ELSE
         |      (CAST(greatest(c, 1) AS DOUBLE) / n1
         |        - CAST(greatest(dcnt, 1) AS DOUBLE) / (n - n1))
         |      * ln(CAST(greatest(c, 1) * (n - n1) AS DOUBLE)
         |        / CAST(greatest(dcnt, 1) * n1 AS DOUBLE))
         |    END AS term
         |  FROM cells CROSS JOIN nn),
         |piv AS (
         |  SELECT source, n1,
         |    $pivotCols
         |  FROM terms GROUP BY source, n1)
         |SELECT source, CAST(n1 AS BIGINT) AS n_docs,
         |  round($foldSum, 6) AS psi
         |FROM piv ORDER BY source""".stripMargin
    },

    // q205: each batch replayed by its %20 membership against the
    // FROZEN corpus baseline — corpus decile cuts and per-bin counts
    // computed once, batches binned against them, the q197 term
    // arithmetic and fixed-order 10-term fold per batch
    "q205_stream_psi" -> {
      val B = PsiBins
      val pivotCols = (0 until B).map(b =>
        s"COALESCE(min(CASE WHEN bin = $b THEN term END), 0.0) AS t_$b")
        .mkString(",\n        |    ")
      val foldSum = (0 until B).map(b => s"t_$b").mkString(" + ")
      s"""WITH corpus AS MATERIALIZED (
         |  SELECT n_chars FROM documents WHERE doc_id % 10 != 7),
         |nn AS (SELECT count(*) AS n2 FROM corpus),
         |cum AS (
         |  SELECT n_chars,
         |    CAST(sum(count(*)) OVER (ORDER BY n_chars) AS BIGINT) AS cc
         |  FROM corpus GROUP BY n_chars),
         |brk AS (
         |  SELECT k, min(n_chars) AS t
         |  FROM cum CROSS JOIN (SELECT unnest(range(1, $B)) AS k) kk
         |    CROSS JOIN nn
         |  WHERE cc * $B >= k * n2
         |  GROUP BY k),
         |cb AS (
         |  SELECT bin, count(*) AS d FROM (
         |    SELECT (SELECT count(*) FROM brk WHERE c.n_chars >= brk.t) AS bin
         |    FROM corpus c) GROUP BY bin),
         |batch AS MATERIALIZED (
         |  SELECT doc_id % 20 AS pk, n_chars FROM documents
         |  WHERE doc_id % 20 IN (7, 17)),
         |bc AS (
         |  SELECT pk, bin, count(*) AS c FROM (
         |    SELECT pk, (SELECT count(*) FROM brk WHERE b.n_chars >= brk.t) AS bin
         |    FROM batch b) GROUP BY pk, bin),
         |bn AS (SELECT pk, count(*) AS n1 FROM batch GROUP BY pk),
         |cells AS (
         |  SELECT p.pk, p.n1, s.bin,
         |    COALESCE(bc.c, 0) AS c, COALESCE(cb.d, 0) AS d
         |  FROM bn p
         |  CROSS JOIN (SELECT unnest(range(0, $B)) AS bin) s
         |  LEFT JOIN bc ON bc.pk = p.pk AND bc.bin = s.bin
         |  LEFT JOIN cb ON cb.bin = s.bin),
         |terms AS (
         |  SELECT pk, n1, bin,
         |    CASE WHEN c + d = 0 THEN 0.0 ELSE
         |      (CAST(greatest(c, 1) AS DOUBLE) / n1
         |        - CAST(greatest(d, 1) AS DOUBLE) / n2)
         |      * ln(CAST(greatest(c, 1) * n2 AS DOUBLE)
         |        / CAST(greatest(d, 1) * n1 AS DOUBLE))
         |    END AS term
         |  FROM cells CROSS JOIN nn),
         |piv AS (
         |  SELECT pk, n1,
         |    $pivotCols
         |  FROM terms GROUP BY pk, n1)
         |SELECT pk AS batch_key, CAST(n1 AS BIGINT) AS n_batch,
         |  round($foldSum, 6) AS psi
         |FROM piv ORDER BY batch_key""".stripMargin
    },

    // q174: each batch replayed by its %20 membership against the
    // static corpus — streamed ≡ one-shot per batch (q108 discipline)
    "q174_stream_ks_drift" ->
      """WITH corpus AS (
        |  SELECT n_chars FROM documents WHERE doc_id % 10 != 7),
        |parts AS (SELECT unnest([7, 17]) AS pk),
        |batch AS (SELECT doc_id % 20 AS pk, n_chars FROM documents
        |          WHERE doc_id % 20 IN (7, 17)),
        |cc AS (SELECT n_chars, count(*) AS ct FROM corpus GROUP BY n_chars),
        |bc AS (SELECT pk, n_chars, count(*) AS bt
        |       FROM batch GROUP BY pk, n_chars),
        |grid AS (SELECT DISTINCT pk, n_chars FROM (
        |  SELECT pk, n_chars FROM bc
        |  UNION ALL
        |  SELECT p.pk, cc.n_chars FROM cc CROSS JOIN parts p) u),
        |cum AS (SELECT g.pk, g.n_chars,
        |    CAST(sum(COALESCE(bt, 0)) OVER (PARTITION BY g.pk
        |      ORDER BY g.n_chars) AS BIGINT) AS c1,
        |    CAST(sum(COALESCE(ct, 0)) OVER (PARTITION BY g.pk
        |      ORDER BY g.n_chars) AS BIGINT) AS c2
        |  FROM grid g
        |    LEFT JOIN bc ON bc.pk = g.pk AND bc.n_chars = g.n_chars
        |    LEFT JOIN cc ON cc.n_chars = g.n_chars),
        |tot AS (SELECT pk, count(*) AS n1 FROM batch GROUP BY pk),
        |ctot AS (SELECT count(*) AS n2 FROM corpus)
        |SELECT pk AS batch_key, CAST(n1 AS BIGINT) AS n_batch,
        |  CAST(max(abs(c1 * n2 - c2 * n1)) AS BIGINT) AS d_scaled,
        |  round(CAST(max(abs(c1 * n2 - c2 * n1)) AS BIGINT)::DOUBLE
        |    / (n1 * n2), 6) AS ks_d
        |FROM cum JOIN tot USING (pk) CROSS JOIN ctot
        |GROUP BY pk, n1, n2 ORDER BY batch_key""".stripMargin,
  )

  /** DuckDB twin of the CMS calibration — shared by q144 (one-shot
    * sketch) and q148 (epoch-grown sketch), whose cell vectors are
    * provably identical (CMS linearity). */
  private val CmsSql: String =
      s"""WITH toks AS (SELECT unnest(string_split(text, ' ')) AS tk FROM documents),
         |cnt AS (SELECT tk, count(*) AS c FROM toks GROUP BY tk),
         |h AS (
         |  SELECT tk, c,
         |    list_reduce(list_prepend(0::BIGINT,
         |      list_transform(string_split(tk,''), ch -> ascii(ch)::BIGINT)),
         |      (a,b) -> (a*131 + b) % 2147483647) AS h1,
         |    list_reduce(list_prepend(0::BIGINT,
         |      list_transform(string_split(tk,''), ch -> ascii(ch)::BIGINT)),
         |      (a,b) -> (a*137 + b) % 2147483647) AS h2
         |  FROM cnt),
         |b AS (
         |  SELECT tk, c, j * $CmsWidth + (h1 + j*h2) % $CmsWidth AS cell_idx
         |  FROM h CROSS JOIN (SELECT unnest(range($CmsDepth)) AS j) jj),
         |cell AS (SELECT cell_idx, sum(c) AS cell FROM b GROUP BY cell_idx),
         |est AS (
         |  SELECT tk, CAST(min(cell) AS BIGINT) AS est
         |  FROM b JOIN cell USING (cell_idx) GROUP BY tk),
         |top AS (SELECT tk, c FROM cnt ORDER BY c DESC, tk LIMIT 20)
         |SELECT t.tk AS token, CAST(t.c AS BIGINT) AS true_cnt, e.est AS est_cnt,
         |  e.est - CAST(t.c AS BIGINT) AS overcount
         |FROM top t JOIN est e USING (tk)
         |ORDER BY true_cnt DESC, token""".stripMargin
}
