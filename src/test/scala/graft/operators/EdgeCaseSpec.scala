package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.SparkSpec
import graft.Tables.{dec, D}

/** Edge cases the null-free, tie-light fixtures cannot exercise
  * (FIXTURES.md "Unit-test fixtures"): null join keys, rank ties, empty
  * inputs, and decimal aggregation corners. */
class EdgeCaseSpec extends SparkSpec {

  test("null keys never match in joins, and survive outer sides") {
    val sess = spark
    import sess.implicits._
    val l = Seq((Some(1L), "a"), (None, "b"), (Some(3L), "c"))
      .toDF("k", "lv")
    val r = Seq((Some(1L), "x"), (None, "y")).toDF("k2", "rv")
    val inner = l.join(r, col("k") === col("k2")).collect()
    assert(inner.length === 1 && inner.head.getString(1) === "a",
      "null = null must not match")
    val outer = l.join(r, col("k") === col("k2"), "left_outer")
      .orderBy(col("lv")).collect()
    assert(outer.length === 3)
    assert(outer(1).getString(1) === "b" && outer(1).isNullAt(2),
      "null-key left row survives with null right side")
  }

  test("rank vs dense_rank vs row_number on ties") {
    val sess = spark
    import sess.implicits._
    val df = Seq(("g", 10), ("g", 10), ("g", 20)).toDF("p", "x")
    val w = Window.partitionBy("p").orderBy("x")
    val r = df.select(
      rank().over(w).as("rnk"),
      dense_rank().over(w).as("drnk"),
      row_number().over(w).as("rn")).orderBy("rn").collect()
    assert(r.map(_.getInt(0)).toSeq === Seq(1, 1, 3))
    assert(r.map(_.getInt(1)).toSeq === Seq(1, 1, 2))
    assert(r.map(_.getInt(2)).toSeq === Seq(1, 2, 3))
  }

  test("aggregation over empty input: global row vs no group rows") {
    val sess = spark
    import sess.implicits._
    val empty = Seq.empty[(String, Double)].toDF("g", "x")
    val global = empty.agg(count(lit(1)).as("n"),
      sum(dec(col("x"))).as("s")).collect()
    assert(global.length === 1)
    assert(global.head.getLong(0) === 0L && global.head.isNullAt(1),
      "global agg emits one row: count 0, sum null")
    assert(empty.groupBy("g").agg(count(lit(1))).collect().isEmpty,
      "grouped agg over empty input emits no rows")
  }

  test("decimal sum overflow yields null (non-ANSI), not silent wrap") {
    val sess = spark
    import sess.implicits._
    assert(spark.conf.get("spark.sql.ansi.enabled") === "false" ||
      spark.conf.get("spark.sql.ansi.enabled") === "true") // document either way
    val big = java.math.BigDecimal.valueOf(9.9e13) // near DECIMAL(18,4) cap
    val df = Seq.fill(10)(big).toDF("x")
      .select(col("x").cast(D).as("x"))
    val s = scala.util.Try(df.agg(sum(col("x")).cast(D)).head())
    // DECIMAL(28,4) intermediate holds 9.9e14 fine; the final (18,4) cast
    // overflows -> null under non-ANSI, exception under ANSI
    s.toOption.foreach(row => assert(row.isNullAt(0)))
  }

  test("set ops treat null as equal (distinct semantics)") {
    val sess = spark
    import sess.implicits._
    val a = Seq(Some(1L), None, None).toDF("k")
    val b = Seq(Option.empty[Long]).toDF("k")
    assert(a.intersect(b).count() === 1, "INTERSECT matches nulls")
    assert(a.except(b).collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getLong(0))).toSeq === Seq(Some(1L)))
  }

  test("session window of a single event spans exactly the gap") {
    val sess = spark
    import sess.implicits._
    val df = Seq((java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L))
      .toDF("ts", "user_id")
    val out = df.groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .select("session_window.start", "session_window.end", "cnt").head()
    assert(out.getTimestamp(0).toString === "2024-01-01 00:00:00.0")
    assert(out.getTimestamp(1).toString === "2024-01-01 00:30:00.0")
  }

  test("q20 approx distinct stays within the HLL++ error bound of exact, " +
      "and the gated boolean is honest") {
    // since r13 the 3·rsd sketch contract IS the gated output (the
    // oracle replays exact_users + TRUE), so this law's job is to keep
    // the engine-side boolean honest: recompute the raw estimate and
    // the exact count independently and require the key's within_3rsd
    // to equal the recomputed comparison — a q20 degenerating into
    // lit(true) fails here even though it would still hash-match.
    // approx_count_distinct's default rsd is 0.05; HLL++ on a FIXED
    // input is deterministic, and 3·rsd (15%) gives head-room over the
    // 1-sigma figure without ever accepting a broken sketch.
    val dir = "/root/testdata/sf0.001"
    val gated = graft.SparkEntry.queries("q20_agg_hll")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    val recompute = graft.Tables.loadEvents(spark, dir)
      .groupBy("event_type")
      .agg(approx_count_distinct(col("user_id")).as("ap"),
        countDistinct(col("user_id")).as("ex"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(gated.keySet === recompute.keySet)
    for ((tpe, (ex, within)) <- gated) {
      val (ap, exR) = recompute(tpe)
      assert(ex === exR, s"$tpe: gated exact_users $ex != recomputed $exR")
      assert(within === (math.abs(ap - ex) <= 0.15 * ex),
        s"$tpe: gated within_3rsd $within disagrees with approx $ap vs $ex")
      assert(within, s"$tpe: approx $ap vs exact $ex exceeds 3·rsd")
    }
  }

  test("round-5 kernels skip nulls and survive degenerate inputs") {
    import graft.plans.MisraGriesAgg.misra_gries
    import graft.plans.TopKAgg.topk_agg
    val sess = spark
    import sess.implicits._
    // MG: null items count toward neither the summary nor the tally
    val mg = Seq(Some("a"), None, Some("a"), None, Some("b"))
      .toDF("item")
      .select(misra_gries(col("item"), 4).as("s"))
      .select(col("s.cand"), col("s.n")).head()
    assert(mg.getSeq[String](0).toSet === Set("a", "b"))
    assert(mg.getLong(1) === 3L, "null items must not inflate n")
    // MG on an all-null column: empty candidates, zero tally
    val mg0 = Seq[Option[String]](None, None).toDF("item")
      .select(misra_gries(col("item"), 4).as("s"))
      .select(col("s.cand"), col("s.n")).head()
    assert(mg0.getSeq[String](0).isEmpty && mg0.getLong(1) === 0L)
    // top-k: null value or id drops the row (same as the window
    // formulation after a WHERE v IS NOT NULL guard); an all-null
    // group emits an EMPTY array, which posexplode then erases —
    // no phantom rows
    val tk = Seq(
        (1L, Some(5.0), Some(10L)), (1L, None, Some(11L)),
        (1L, Some(7.0), None), (2L, None, None))
      .toDF("g", "v", "id")
      .groupBy("g")
      .agg(topk_agg(col("v"), col("id"), 3).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), col("col.value"), col("col.id"))
      .as[(Long, Double, Long)].collect().toSet
    assert(tk === Set((1L, 5.0, 10L)))
    // chunking a single-token document: exactly one 1-token chunk
    val one = Seq((9L, "solo")).toDF("doc_id", "text")
    val chunks = one
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(1), greatest(size(col("toks")), lit(1)),
          lit(CurationQueries.ChunkStride))).as("st"))
      .select(col("doc_id"),
        size(slice(col("toks"), col("st"), lit(CurationQueries.ChunkWidth)))
          .as("n"))
      .collect()
    assert(chunks.length === 1 && chunks.head.getInt(1) === 1)
  }

  test("q122 recall invariants: one row per query, n_hit in [0,3]") {
    val out = SimilarityQueries.annRecall(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.length === 10, "sf0.001 has 10 bounded queries")
    out.foreach { r =>
      val h = r.getAs[Long]("n_hit")
      assert(h >= 0L && h <= 3L, s"n_hit out of range: $h")
      assert(r.getAs[Double]("recall") ===
        BigDecimal(h / 3.0).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble, "recall must be n_hit/3 rounded to 6")
    }
  }

  test("q178 TSV null codec is total: sentinel look-alikes round-trip") {
    // the r13 escape closes the one partiality hole the fixtures can't
    // see: a document whose text (or lang/source) is literally \N —
    // or any member of the escape class \\N, \\\N, … — must come back
    // verbatim, while a true NULL still round-trips to NULL
    val sess = spark
    import sess.implicits._
    val vals: Seq[String] = Seq(
      null, "\\N", "\\\\N", "N", "\\", "x\\N", "\\Nx", "\\\\\\N", "", "plain")
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    val back = df
      .select(col("id"), ScanQueries.tsvEncStr(col("v")).as("enc"))
      .select(col("id"), col("enc"),
        ScanQueries.tsvDecStr(col("enc")).as("dec"))
      .orderBy("id").collect()
    back.zip(vals).foreach { case (r, v) =>
      assert(!r.isNullAt(1), "encoding is never null (concat_ws-safe)")
      assert(Option(r.getString(2)) === Option(v),
        s"round-trip of ${Option(v)} gave ${Option(r.getString(2))} " +
          s"via ${r.getString(1)}")
    }
    // injectivity across the whole set: distinct inputs, distinct encodings
    assert(back.map(_.getString(1)).distinct.length === vals.length)
  }
}
