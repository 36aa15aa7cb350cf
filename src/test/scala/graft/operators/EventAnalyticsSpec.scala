package graft.operators

import graft.SparkSpec
import graft.Tables.loadEvents

/** Integrity laws of the SCD2 build/lookup pair that the hash gate
  * implies but doesn't state: q94's half-open validity intervals TILE
  * each user's observed timeline, so a point-in-time lookup matches
  * every event exactly once, and every NON-EMPTY version is touched.
  * (A version can be empty: two equal-ts events straddling a type
  * change yield [T, T) — its defining event falls in the successor.
  * The tiling law is exact either way; "hits every version" is not.) */
class EventAnalyticsSpec extends SparkSpec {

  import org.apache.spark.sql.functions._

  private val dir = "/root/testdata/sf0.001"

  test("q104: intervals tile the timeline — every event matches exactly one version") {
    val r = EventAnalytics.queries("q104_scd2_lookup")(spark, dir).head()
    val nEvents = loadEvents(spark, dir).count()
    val dim = EventAnalytics.queries("q94_scd2")(spark, dir)
    val nonEmptyVersions = dim.filter(
      col("valid_to").isNull || col("valid_from") < col("valid_to")).count()
    assert(r.getAs[Long]("n_events_matched") === nEvents,
      "a gap or overlap in validity intervals would drop or double-count")
    assert(r.getAs[Long]("n_versions_hit") === nonEmptyVersions,
      "every non-empty version contains at least one event")
  }

  test("q133: flagged buckets equal a driver-side exact recompute") {
    val out = EventAnalytics.queries("q133_rate_anomaly")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2))).toSet
    val hourly = loadEvents(spark, dir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
      .agg(count(lit(1)).as("cnt")).collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2)))
    val flagged = hourly.groupBy(_._1).flatMap { case (_, rows) =>
      val n = rows.length.toDouble
      val s1 = rows.map(_._3).sum.toDouble
      val s2 = rows.map(r => r._3 * r._3).sum.toDouble
      val mean = s1 / n
      val variance = (s2 - s1 * s1 / n) / n
      if (variance <= 0) Seq.empty[(String, java.sql.Timestamp, Long)]
      else rows.toSeq.filter(r =>
        math.abs((r._3 - mean) / math.sqrt(variance)) >= 2.0)
    }.toSet
    assert(out === flagged,
      "the declarative z-score filter must match exact driver arithmetic")
  }

  test("q158: sessions partition the stream and equal an exact driver-side sessionizer") {
    val out = EventAnalytics.queries("q158_sessionize")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4)))
    // lossless partition: every event lands in exactly one session
    assert(out.map(_._3).sum === loadEvents(spark, dir).count(),
      "session n_events must sum to the full event count")
    // exact recompute: split each user's sorted timeline on >8h gaps
    val gapUs = 28800000000L
    val byUser = loadEvents(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val expect = byUser.flatMap { case (uid, rows) =>
      val ts = rows.sortBy(r => (r._2, r._3)).map(_._2)
      val splits = ts.indices.map(i =>
        i == 0 || ts(i) - ts(i - 1) > gapUs)
      val sids = splits.scanLeft(0L)((a, b) => if (b) a + 1 else a).tail
      ts.zip(sids).groupBy(_._2).map { case (sid, g) =>
        (uid, sid, g.length.toLong, (g.map(_._1).max - g.map(_._1).min) / 1000000L)
      }
    }.toSet
    assert(out.toSet === expect,
      "lag/running-sum sessionization must equal the exact split-on-gap semantics")
  }

  test("q170: decayed count equals the exact ordered fold and sits in (0, n]") {
    val got = EventAnalytics.queries("q170_decay_weighted")(spark, dir)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getAs[Double]("decayed_count"))).toMap
    val hourly = loadEvents(spark, dir)
      .groupBy(col("event_type"),
        expr("unix_micros(date_trunc('hour', ts)) div 3600000000").as("hr"))
      .agg(count(lit(1)).as("cnt")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val mx = hourly.map(_._2).max
    val c = -math.log(2.0) / 24
    val expect = hourly.groupBy(_._1).map { case (t, rows) =>
      val w = rows.map(r => ((mx - r._2), r._3)).sortBy(_._1)
        .foldLeft(0.0) { case (acc, (age, cnt)) =>
          acc + cnt.toDouble * math.exp(age.toDouble * c) }
      t -> (rows.map(_._3).sum,
        BigDecimal(w).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    assert(got === expect, "decay fold must equal the exact ordered replay")
    got.foreach { case (t, (n, w)) =>
      assert(w > 0 && w <= n.toDouble,
        s"$t: decayed count $w must sit in (0, n_events=$n]")
    }
  }

  test("q175: lag percentiles equal the exact sorted-rank recompute") {
    val r = EventAnalytics.queries("q175_conversion_lag")(spark, dir).head()
    val ev = loadEvents(spark, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .collect().map(x => (x.getLong(0), x.getString(1), x.getLong(2)))
    val lats = ev.groupBy(_._1).flatMap { case (_, rows) =>
      val vs = rows.filter(_._2 == "view").map(_._3)
      if (vs.isEmpty) None
      else {
        val v = vs.min
        val ps = rows.filter(r => r._2 == "purchase" && r._3 >= v).map(_._3)
        if (ps.isEmpty) None else Some((ps.min - v) / 1000000L)
      }
    }.toSeq.sorted
    val n = lats.length
    assert(r.getAs[Long]("n_converted") === n.toLong)
    assert(r.getAs[Long]("p50_s") === lats((n + 1) / 2 - 1),
      "p50 must be the smallest latency whose rank covers half")
    assert(r.getAs[Long]("p90_s") === lats(math.ceil(n * 9 / 10.0).toInt - 1))
    assert(r.getAs[Long]("max_s") === lats.last)
  }

  test("q182: LTV cumulative chain reconciles with weekly values and q77 cohorts") {
    val out = EventAnalytics.queries("q182_cohort_ltv")(spark, dir).collect()
    // per cohort, the running total telescopes: last cum = sum of weeks
    out.groupBy(_.getDate(0).toString).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      val cums = sorted.map(_.getAs[Double]("ltv_cum"))
      val weeks = sorted.map(_.getAs[Double]("week_value"))
      assert(math.abs(cums.last - weeks.sum) < 1e-6,
        "decimal running sum must telescope exactly")
      assert(cums.zip(cums.tail).forall { case (a, b) => b >= a - 1e-9 },
        "purchase values are nonnegative, so LTV is nondecreasing")
    }
    // cohorts must be a subset of q77's cohort days
    val cohortDays = EventAnalytics.queries("q77_retention")(spark, dir)
      .select("cohort_day").distinct().collect().map(_.getDate(0).toString).toSet
    assert(out.map(_.getDate(0).toString).toSet.subsetOf(cohortDays))
  }

  test("q183: the windowed funnel never exceeds the unbounded conversion set") {
    val r = EventAnalytics.queries("q183_funnel_windowed")(spark, dir).head()
    val nViewers = r.getAs[Long]("n_viewers")
    val n7 = r.getAs[Long]("n_converted_7d")
    assert(n7 >= 0 && n7 <= nViewers)
    // unbounded converters (any purchase at/after first view) bound it
    val ev = loadEvents(spark, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .collect().map(x => (x.getLong(0), x.getString(1), x.getLong(2)))
    val unbounded = ev.groupBy(_._1).count { case (_, rows) =>
      val vs = rows.filter(_._2 == "view").map(_._3)
      vs.nonEmpty && rows.exists(r => r._2 == "purchase" && r._3 >= vs.min)
    }
    val windowed = ev.groupBy(_._1).count { case (_, rows) =>
      val vs = rows.filter(_._2 == "view").map(_._3)
      vs.nonEmpty && rows.exists(r => r._2 == "purchase" &&
        r._3 >= vs.min && r._3 - vs.min <= 7L * 86400L * 1000000L)
    }
    assert(n7 === windowed.toLong, "exact recompute of the 7d window")
    assert(n7 <= unbounded.toLong, "the window can only shrink the set")
  }

  test("q186: journeys are 5-capped paths whose board is consistent with q158") {
    val out = EventAnalytics.queries("q186_top_journeys")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(out.forall(_._1.split(">").length <= 5),
      "journeys must truncate to the first 5 steps")
    assert(out.forall { case (j, _) =>
      j.split(">").forall(Set("view", "click", "purchase", "signup", "error"))
    }, "steps must be real event types")
    // the board's counts cannot exceed the total session count, and the
    // top journey must cover at least one session
    val nSessions = EventAnalytics.queries("q158_sessionize")(spark, dir).count()
    assert(out.map(_._2).sum <= nSessions && out.head._2 >= 1)
    // counts are non-increasing down the board (orderBy desc)
    assert(out.map(_._2).sliding(2).forall(p => p.head >= p.last))
  }

  test("q161: slope equals an exact driver-side OLS over hourly counts") {
    val got = EventAnalytics.queries("q161_trend_slope")(spark, dir)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getAs[Double]("slope_per_hour")))
      .toMap
    val hourly = loadEvents(spark, dir)
      .groupBy(col("event_type"),
        expr("unix_micros(date_trunc('hour', ts)) div 3600000000").as("x"))
      .agg(count(lit(1)).as("y")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = hourly.groupBy(_._1).flatMap { case (t, rows) =>
      val n = rows.length.toLong
      val sx = rows.map(_._2).sum; val sy = rows.map(_._3).sum
      val sxx = rows.map(r => r._2 * r._2).sum
      val sxy = rows.map(r => r._2 * r._3).sum
      val den = n * sxx - sx * sx
      if (den <= 0) None
      else Some(t -> (n, sy,
        BigDecimal((n * sxy - sx * sy).toDouble / den)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }
    assert(got === expect,
      "declarative OLS must equal exact integer-moment driver arithmetic")
  }
}
