package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Event-analytics operators over the events fixture (q77–q78): cohort
  * retention and conversion funnels — the standard product-analytics
  * queries a warehouse load (the reference's declared target) exists to
  * serve.
  *
  * Scale notes: retention is two hash aggregations (per-user cohort,
  * then cohort×week distinct counts) — both shuffle on bounded keys.
  * The funnel is ONE user_id-clustered pass: the stage cutoffs chain
  * as conditional-min windows over the same partitioning, so a single
  * exchange serves all three stages and the per-user collapse. Nothing
  * is quadratic; everything partitions on user_id. */
object EventAnalytics {

  /** The SCD2 dimension frame shared by q94 (build) and q104 (lookup):
    * one user_id exchange serves the lag window, the running-sum
    * window, the segment groupBy and the lead window (exchange reuse —
    * see q94's scale note). */
  private def scd2Dimension(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byTs = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val runs = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val byVersion = Window.partitionBy("user_id").orderBy("version")
    loadEvents(s, dir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("chg",
        when(lag(col("event_type"), 1).over(byTs).isNull
          || lag(col("event_type"), 1).over(byTs) =!= col("event_type"),
          lit(1)).otherwise(lit(0)))
      .withColumn("version", sum(col("chg")).over(runs).cast("long"))
      .groupBy(col("user_id"), col("version"))
      .agg(max(col("event_type")).as("event_type"), // constant per segment
        min(col("ts")).as("valid_from"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byVersion))
      .select("user_id", "version", "event_type", "valid_from", "valid_to")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Weekly retention: users grouped by first-seen day (cohort), then
    // distinct active users per (cohort, week offset).
    "q77_retention" -> { (s, dir) =>
      val ev = loadEvents(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("day"))
      val cohorts = ev.groupBy("user_id").agg(min("day").as("cohort_day"))
      ev.join(cohorts, "user_id")
        .withColumn("week_offset",
          floor(datediff(col("day"), col("cohort_day")) / 7).cast("long"))
        .groupBy("cohort_day", "week_offset")
        .agg(countDistinct("user_id").as("active_users"))
        .orderBy("cohort_day", "week_offset")
    },

    // Ordered conversion funnel view → click → purchase: a user counts
    // for a stage only if it happened at-or-after their previous stage.
    // ONE events pass, ONE user_id exchange: the three stage times are
    // conditional-min windows over the same user partitioning (each
    // referencing the previous stage's column), the per-user collapse
    // reuses the clustering, and the final row is a count of non-null
    // stage times. The r6 shape chained per-stage filter→join→agg
    // frames whose final counts re-expanded the whole chain — 6 event
    // scans and a join tree; this is the plan a funnel deserves.
    "q78_funnel" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id")
      loadEvents(s, dir).select("user_id", "event_type", "ts")
        .withColumn("v_ts",
          min(when(col("event_type") === "view", col("ts"))).over(w))
        .withColumn("c_ts",
          min(when(col("event_type") === "click" &&
            col("ts") >= col("v_ts"), col("ts"))).over(w))
        .withColumn("p_ts",
          min(when(col("event_type") === "purchase" &&
            col("ts") >= col("c_ts"), col("ts"))).over(w))
        .groupBy("user_id")
        .agg(max("v_ts").as("v_ts"), max("c_ts").as("c_ts"),
          max("p_ts").as("p_ts")) // stage times are constant per user
        .agg(count("v_ts").as("n_view"),
          count("c_ts").as("n_click_after_view"),
          count("p_ts").as("n_purchase_after_click"))
    },

    // SCD type-2 dimension build: collapse each user's event_type
    // timeline into change segments with [valid_from, valid_to)
    // validity intervals (valid_to NULL = current) — the classic
    // warehouse-dimension load the reference's Redshift target implies.
    //
    // Scale note: ONE shuffle on user_id serves everything — the lag
    // window, the running-sum window, the segment groupBy, and the
    // lead window all share the user_id partitioning, so Catalyst
    // reuses the exchange; per-user state is a sort, never a
    // materialized timeline.
    "q94_scd2" -> { (s, dir) =>
      scd2Dimension(s, dir).orderBy("user_id", "version")
    },

    // Point-in-time (temporal) dimension lookup: every event joined to
    // the SCD2 version valid AT its timestamp — the query a type-2
    // dimension exists to answer, and the integrity proof that q94's
    // half-open intervals tile each user's timeline exactly (each
    // event matches exactly one version; zero-width versions — two
    // equal-ts events straddling a type change — match nothing by
    // construction; the gate compares coverage stats).
    //
    // Routed through the NATIVE as-of operator (plans/AsOfJoinPlan —
    // preference-order (c), the same node q61 gates): because q94's
    // half-open intervals tile each user's timeline, "the version
    // valid AT ts" ≡ "the LATEST version with valid_from <= ts" — an
    // as-of join on (user_id, valid_from) with version as tie-break.
    // Equal-valid_from chains (zero-width versions) resolve to the MAX
    // version via the (ts, version) right-sort + last-match-wins merge,
    // exactly the interval answer: a zero-width version's successor
    // shares its valid_from, so zero-width versions still match
    // nothing. The oracle keeps the declarative interval join — the
    // differential check IS the proof of the equivalence.
    //
    // Scale note vs the old range-residual SMJ: same two user_id
    // exchanges (the dimension side reuses q94's build exchange), but
    // the merge carries ONE last-seen row instead of buffering each
    // user's version block for the range residual; per-row work is the
    // monotone merge advance. Hot-key safety: one user's timeline is
    // one partition here (bounded versions/user); asofSalted is the
    // escape hatch when a key's event volume outgrows a task.
    "q104_scd2_lookup" -> { (s, dir) =>
      val dim = scd2Dimension(s, dir)
        .select(col("user_id").as("d_uid"), col("version").as("d_version"),
          col("valid_from").as("d_from"))
      val ev = loadEvents(s, dir).select(col("user_id"), col("ts"))
      // keep the LEFT key attribute: the as-of node reports the events
      // side's hashpartitioning(user_id), so grouping on it reuses the
      // exchange — selecting the right side's d_uid (equal on every
      // matched row, and every row matches by tiling) would drop the
      // partitioning attribute and re-shuffle the per-version counts
      val matched = AsOfJoin.asof(ev, dim,
          leftKey = "user_id", rightKey = "d_uid",
          leftTs = "ts", rightTs = "d_from",
          rightTieBreak = Seq("d_version"))
        .select(col("user_id"), col("d_version").as("version"))
      matched.groupBy("user_id", "version")
        .agg(count(lit(1)).as("n_events"))
        .groupBy()
        .agg(count(lit(1)).as("n_versions_hit"),
          sum("n_events").cast("long").as("n_events_matched"),
          max("n_events").as("max_events_per_version"),
          sum(when(col("n_events") === 1, 1L).otherwise(0L)).cast("long")
            .as("singleton_versions"))
    },

    // Event-sequence transition matrix (first-order Markov counts):
    // how often each event_type is followed by each other, per-user
    // timelines stitched by lead(). The path-analysis primitive behind
    // funnels/journey maps; one user_id window + one bounded-key agg.
    "q105_transitions" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      loadEvents(s, dir)
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"),
          col("next_type").as("to_type"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("from_type", "to_type")
    },

    // SkewOps.saltedSumCount under the oracle gate (the aggregation
    // twin of q74's salted join): event_type is the classic 5-hot-keys
    // shape — a plain groupBy sends each key to ONE reducer, the salted
    // two-phase agg spreads each over 8 (key, salt) partials first.
    // Decimal partials keep exactness, so the result equals the plain
    // GROUP BY bit-for-bit.
    "q97_agg_salted" -> { (s, dir) =>
      val ev = loadEvents(s, dir)
        .select(col("event_type"), dec(col("value")).as("v"), col("event_id"))
      SkewOps.saltedSumCount(ev, col("event_type"), col("v"),
          col("event_id"), 8)
        .select(col("k").as("event_type"),
          col("sum_value").cast(D).cast("double").as("sum_value"),
          col("cnt"))
        .orderBy("event_type")
    },

    // Ingest-rate anomaly detection — the ops monitor a pipeline runs
    // over its own event stream: hourly counts per event_type, z-scored
    // against that type's own hourly distribution, anomalous buckets
    // (|z| ≥ 2) reported. Mean/variance come from EXACT integer sums
    // (n, Σcnt, Σcnt²) — both engines derive identical IEEE doubles
    // from identical longs via the textually identical formula, so the
    // |z| ≥ 2 cut is deterministic (no engine stddev builtin, whose
    // accumulation order could differ). Scale: one bounded-key count
    // (type × hour), a |types|-row stats re-agg broadcast back — the
    // q126 histogram discipline; nothing sorts, nothing windows. The
    // var > 0 guard keeps constant-rate types out of NaN territory on
    // both engines.
    "q133_rate_anomaly" -> { (s, dir) =>
      val hourly = loadEvents(s, dir)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
        .agg(count(lit(1)).as("cnt"))
      val stats = hourly.groupBy("event_type")
        .agg(count(lit(1)).as("n_hours"),
          sum("cnt").cast("long").as("s1"),
          sum(col("cnt") * col("cnt")).cast("long").as("s2"))
      hourly.join(broadcast(stats), "event_type")
        .withColumn("mean", col("s1").cast("double") / col("n_hours"))
        .withColumn("variance",
          (col("s2").cast("double") -
            col("s1").cast("double") * col("s1") / col("n_hours"))
            / col("n_hours"))
        .filter(col("variance") > 0)
        .withColumn("z", (col("cnt") - col("mean")) / sqrt(col("variance")))
        .filter(abs(col("z")) >= 2.0)
        .select(col("event_type"), col("hr"), col("cnt"),
          round(col("mean"), 6).as("mean_cnt"),
          round(col("z"), 6).as("zscore"))
        .orderBy("event_type", "hr")
    },

    // BATCH gap sessionization — the q41/q85 session-window semantics
    // as a deterministic batch operator over the full history (the
    // backfill twin every streaming sessionizer needs: reprocessing a
    // day of late data runs THIS, not the state store). A session
    // breaks when the gap to the previous event exceeds 8h (the
    // fixture's median inter-event gap is ~7.3h, so the cut genuinely
    // mixes multi-event and singleton sessions instead of degenerating
    // either way). Scale: ONE user_id exchange serves the lag window,
    // the running-sum session counter AND the (user_id, session_idx)
    // groupBy — the scd2Dimension exchange-reuse shape; no
    // corpus-wide sort, no self-join. Duration stays in exact integer
    // micros until one floor-division to seconds (identical longs →
    // identical doubles → identical floor on both engines).
    "q158_sessionize" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val byTs = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val runs = byTs.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      loadEvents(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("prev_ts", lag(col("ts"), 1).over(byTs))
        .withColumn("new_s",
          when(col("prev_ts").isNull ||
            unix_micros(col("ts")) - unix_micros(col("prev_ts")) > SessionGapUs,
            lit(1L)).otherwise(lit(0L)))
        .withColumn("session_idx", sum("new_s").over(runs).cast("long"))
        .groupBy("user_id", "session_idx")
        .agg(count(lit(1)).as("n_events"),
          min("ts").as("session_start"),
          floor((unix_micros(max(col("ts"))) - unix_micros(min(col("ts"))))
            / lit(1000000L)).as("duration_s"),
          countDistinct("event_type").as("n_types"))
        .orderBy("user_id", "session_idx")
    },
    // INGEST TREND — per-type OLS slope of hourly event volume, the
    // "is this source growing or dying" number a pipeline dashboard
    // fits over its own telemetry (q133 flags hourly outliers; this
    // fits the direction they deviate FROM). All five sufficient
    // statistics (n, Σx, Σy, Σxx, Σxy — x = hour index, y = hourly
    // count) are EXACT integer sums: the classic catastrophic
    // cancellation in n·Σxy − Σx·Σy happens in int64 arithmetic where
    // it is exact, and both engines derive the slope double from
    // identical longs via the textually identical formula (the q133
    // discipline). x is CENTERED at the per-type min hour before the
    // moment sums — OLS slope is shift-invariant, EXACTLY so in
    // integer arithmetic (n·Σxy−ΣxΣy and n·Σxx−(Σx)² are unchanged
    // by x→x−c), and centering bounds the products by the SPAN, not
    // the epoch: raw epoch-hour indices (~4.9e5) put n·Σxx within
    // ~80× of int64 max on a 720-hour fixture (a 6–9-month table
    // overflows); centered, n·Σxx ≤ span⁴ — safe to ~55k-hour
    // (≈ 6-year) spans, and the y-side n·Σxy ≤ span²·N_events holds
    // to 3e9 events on a year span. Scale: one bounded-key count
    // (type × hour), a window-min over that metadata-scale frame,
    // then a |types|-row re-agg — map-side combinable throughout.
    // The denominator guard drops single-hour types (slope
    // undefined) on both engines.
    "q161_trend_slope" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val hourly = loadEvents(s, dir)
        .groupBy(col("event_type"),
          expr("unix_micros(date_trunc('hour', ts)) div 3600000000")
            .as("xr"))
        .agg(count(lit(1)).as("y"))
        .withColumn("x",
          col("xr") - min("xr").over(Window.partitionBy("event_type")))
      hourly.groupBy("event_type")
        .agg(count(lit(1)).as("n_hours"),
          sum("x").cast("long").as("sx"),
          sum("y").cast("long").as("sy"),
          sum(col("x") * col("x")).cast("long").as("sxx"),
          sum(col("x") * col("y")).cast("long").as("sxy"))
        .filter(col("n_hours") * col("sxx") - col("sx") * col("sx") > 0)
        .withColumn("slope",
          (col("n_hours") * col("sxy") - col("sx") * col("sy"))
            .cast("double")
            / (col("n_hours") * col("sxx") - col("sx") * col("sx")))
        .select(col("event_type"), col("n_hours"), col("sy").as("n_events"),
          round(col("slope"), 6).as("slope_per_hour"),
          round(col("slope") * 24, 6).as("slope_per_day"))
        .orderBy("event_type")
    },
    // RECENCY-DECAYED volume — exponential time-decay weighting with a
    // 24h half-life: the score a replay-sampling or trending-topics
    // pass uses so yesterday counts half of today. Decay weights are
    // FP, so the discipline is the q130 sorted-fold: hourly counts
    // (exact longs, bounded keys) collect per type, sort by age, and
    // fold in ONE deterministic order — never a shuffle-order double
    // sum; weight = exp(-age·ln2/24) is one exp per hour bucket on
    // identical doubles. Age in exact integer hours from the global
    // max hour (a 1-row broadcast crossJoin, the q130 shape). Scale:
    // the per-type fold touches |hours| elements — calendar-bounded
    // (10 years ≈ 90k), not corpus-bounded.
    "q170_decay_weighted" -> { (s, dir) =>
      val hourly = loadEvents(s, dir)
        .groupBy(col("event_type"),
          expr("unix_micros(date_trunc('hour', ts)) div 3600000000")
            .as("hr"))
        .agg(count(lit(1)).as("cnt"))
      val mx = hourly.agg(max("hr").as("mx"))
      hourly.crossJoin(broadcast(mx))
        .withColumn("age", (col("mx") - col("hr")).cast("long"))
        .groupBy("event_type")
        .agg(sum("cnt").cast("long").as("n_events"),
          aggregate(
            transform(
              array_sort(collect_list(struct(col("age"), col("cnt")))),
              // the decay constant assembles IN-ENGINE (-ln(2)/24) so
              // both engines derive the identical double, never a
              // hand-transcribed literal
              x => x.getField("cnt").cast("double")
                * exp(x.getField("age").cast("double")
                  * (-log(lit(2.0)) / 24))),
            lit(0.0), (acc, v) => acc + v).as("w"))
        .select(col("event_type"), col("n_events"),
          round(col("w"), 6).as("decayed_count"))
        .orderBy("event_type")
    },
    // CONVERSION LAG — the latency distribution between a user's first
    // view and their first purchase AFTER it: the "how long does the
    // funnel take" number (q78 counts who converts; this measures how
    // fast). Exact integer end-to-end: latencies in floor-divided
    // seconds, percentiles as EXACT rank cuts (smallest latency whose
    // rank covers the quantile, rn·2 ≥ n / rn·10 ≥ n·9 — the q157
    // integer-quota discipline; never an interpolating percentile
    // builtin whose (1−g)·a+g·b arithmetic could differ). Scale note:
    // the rank window sorts the per-USER latency frame (one row per
    // converted user — events already collapsed), the one sort exact
    // percentiles inherently need; q126 calibrates the histogram
    // shortcut for when even that is too much.
    "q175_conversion_lag" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val ev = loadEvents(s, dir)
      val views = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("v_ts"))
      val buys = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("p_ts"))
      val lat = views.join(buys, "user_id")
        .filter(col("p_ts") >= col("v_ts"))
        .groupBy("user_id").agg(min("p_ts").as("p_ts"), min("v_ts").as("v_ts"))
        .select(col("user_id"),
          floor((unix_micros(col("p_ts")) - unix_micros(col("v_ts")))
            / lit(1000000L)).as("lat_s"))
      // VALUE-LEVEL rank cuts (r22): the old row_number over
      // Window.orderBy(lat_s, user_id) sorted ALL converted users in
      // one partition (plus a second single-partition count() window for
      // n). The cuts only ever read the VALUE at the crossing rank, and
      // ties share a value, so the user_id tie-break never affects the
      // output: with C(v) = # users with lat_s ≤ v (nondecreasing),
      // min{lat_s : rn·2 ≥ n} = value at rank ⌈n/2⌉ = min{v : 2·C(v) ≥ n}
      // — and likewise for p90. So rank per-VALUE, not per-user: one
      // groupBy on lat_s (map-side combinable), then the cumulative
      // window runs over the distinct-latency frame, bounded by the
      // event-time span in seconds, not by the user count.
      val perVal = lat.groupBy("lat_s").agg(count(lit(1)).as("cnt"))
      val wCum = Window.orderBy("lat_s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      perVal
        .withColumn("cum", sum("cnt").over(wCum))
        .withColumn("n", sum("cnt").over(Window.partitionBy()))
        .agg(max("n").cast("long").as("n_converted"),
          min(when(col("cum") * 2 >= col("n"), col("lat_s")))
            .cast("long").as("p50_s"),
          min(when(col("cum") * 10 >= col("n") * 9, col("lat_s")))
            .cast("long").as("p90_s"),
          max("lat_s").cast("long").as("max_s"))
    },
    // COHORT LTV — cumulative purchase value per (cohort, week): the
    // value dimension q77's retention counts lack ("do the users who
    // stay also SPEND"). Value sums accumulate in DECIMAL(18,4)
    // partials (the q97 exactness discipline — a double sum's shuffle
    // order would leak into the cumulative chain) and cast to double
    // only at display; the running total is a decimal window sum per
    // cohort over the week offset. Shapes: one per-user cohort agg,
    // one bounded (cohort × week) agg, one cohort-partitioned window
    // — each shuffles on bounded keys.
    "q182_cohort_ltv" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val ev = loadEvents(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("day"),
          col("event_type"), dec(col("value")).as("v"))
      val cohorts = ev.groupBy("user_id").agg(min("day").as("cohort_day"))
      val weekly = ev.filter(col("event_type") === "purchase")
        .join(cohorts, "user_id")
        .withColumn("week_offset",
          floor(datediff(col("day"), col("cohort_day")) / 7).cast("long"))
        .groupBy("cohort_day", "week_offset")
        .agg(count(lit(1)).as("n_purchases"), sum("v").as("wk_value"))
      val w = Window.partitionBy("cohort_day").orderBy("week_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      weekly
        .withColumn("cum", sum("wk_value").over(w))
        .select(col("cohort_day"), col("week_offset"), col("n_purchases"),
          col("wk_value").cast(D).cast("double").as("week_value"),
          col("cum").cast(D).cast("double").as("ltv_cum"))
        .orderBy("cohort_day", "week_offset")
    },

    // WINDOWED funnel — q78's view→purchase conversion restricted to a
    // 7-DAY window after the user's first view: the product metric as
    // actually defined (an unbounded funnel credits conversions that
    // happen months later). Exact integer micros decide the window on
    // both engines; the per-user collapse is one user_id-clustered
    // pass (q78's shape) and the output is the 3-scalar funnel row.
    "q183_funnel_windowed" -> { (s, dir) =>
      val ev = loadEvents(s, dir)
      val views = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("v_ts"))
      val conv = views.join(
          ev.filter(col("event_type") === "purchase")
            .select(col("user_id"), col("ts").as("p_ts")), "user_id")
        .filter(col("p_ts") >= col("v_ts") &&
          unix_micros(col("p_ts")) - unix_micros(col("v_ts"))
            <= lit(7L * 86400L * 1000000L))
        .select("user_id").distinct()
      views.agg(count(lit(1)).cast("long").as("n_viewers"))
        // 1-row global agg — broadcast explicitly; the estimator sizes
        // it from the events scan underneath (q45/q201 discipline)
        .crossJoin(broadcast(
          conv.agg(count(lit(1)).cast("long").as("n_converted_7d"))))
        .select(col("n_viewers"), col("n_converted_7d"),
          round(col("n_converted_7d").cast("double") / col("n_viewers"), 6)
            .as("cvr_7d"))
    },
    // TOP JOURNEYS — the most common within-session event-type paths
    // (first 5 steps): q105 counts single transitions, this mines the
    // SEQUENCES product analytics actually reads ("view→click→
    // purchase" vs "view→error→view"). Composition: q158's
    // sessionization chain (same gap, same one-user_id-exchange
    // shape), then each session's path assembles via the
    // deterministic sorted-struct fold — collect, array_sort on
    // (ts, event_id), transform, slice — never relying on
    // collect_list's arrival order; journeys count in a bounded-key
    // agg (paths are 5-step strings over 5 types) and the top-20
    // orders on (count, journey). Truncation to 5 steps is explicit:
    // full paths would make the key space session-length-unbounded.
    "q186_top_journeys" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val byTs = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val runs = byTs.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      loadEvents(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("prev_ts", lag(col("ts"), 1).over(byTs))
        .withColumn("new_s",
          when(col("prev_ts").isNull ||
            unix_micros(col("ts")) - unix_micros(col("prev_ts")) > SessionGapUs,
            lit(1L)).otherwise(lit(0L)))
        .withColumn("session_idx", sum("new_s").over(runs).cast("long"))
        .groupBy("user_id", "session_idx")
        .agg(collect_list(struct(col("ts"), col("event_id"),
          col("event_type"))).as("evs"))
        .select(array_join(
          slice(transform(array_sort(col("evs")),
            e => e.getField("event_type")), 1, 5), ">").as("journey"))
        .groupBy("journey").agg(count(lit(1)).as("n_sessions"))
        .orderBy(desc("n_sessions"), col("journey"))
        .limit(20)
    },
  )

  /** q158 session gap: 8 hours in epoch micros. */
  private val SessionGapUs = 28800000000L

  def oracle: Map[String, String] = Map(
    "q77_retention" ->
      """WITH e AS (
        |  SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day FROM events),
        |cohorts AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY user_id)
        |SELECT cohort_day,
        |  CAST(floor(date_diff('day', cohort_day, day) / 7) AS BIGINT) AS week_offset,
        |  count(DISTINCT user_id) AS active_users
        |FROM e JOIN cohorts USING (user_id)
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,

    "q78_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |v AS (SELECT user_id, min(ts) AS v_ts FROM e WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(e.ts) AS c_ts FROM e JOIN v USING (user_id)
        |      WHERE e.event_type = 'click' AND e.ts >= v.v_ts GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(e.ts) AS p_ts FROM e JOIN c USING (user_id)
        |      WHERE e.event_type = 'purchase' AND e.ts >= c.c_ts GROUP BY e.user_id)
        |SELECT (SELECT count(*) FROM v) AS n_view,
        |       (SELECT count(*) FROM c) AS n_click_after_view,
        |       (SELECT count(*) FROM p) AS n_purchase_after_click""".stripMargin,

    "q94_scd2" ->
      """WITH e AS (
        |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id
        |  FROM events),
        |c AS (SELECT *, CASE WHEN lag(event_type) OVER w IS NULL
        |        OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT *, CAST(sum(chg) OVER (PARTITION BY user_id
        |        ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS version
        |      FROM c),
        |g AS (SELECT user_id, version, max(event_type) AS event_type,
        |        min(ts) AS valid_from
        |      FROM s GROUP BY user_id, version)
        |SELECT user_id, version, event_type, valid_from,
        |  lead(valid_from) OVER (PARTITION BY user_id ORDER BY version) AS valid_to
        |FROM g ORDER BY user_id, version""".stripMargin,

    "q104_scd2_lookup" ->
      """WITH e AS (
        |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id
        |  FROM events),
        |c AS (SELECT *, CASE WHEN lag(event_type) OVER w IS NULL
        |        OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT *, CAST(sum(chg) OVER (PARTITION BY user_id
        |        ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS version
        |      FROM c),
        |g AS (SELECT user_id, version, max(event_type) AS event_type,
        |        min(ts) AS valid_from
        |      FROM s GROUP BY user_id, version),
        |dim AS (SELECT user_id, version, valid_from,
        |  lead(valid_from) OVER (PARTITION BY user_id ORDER BY version) AS valid_to
        |  FROM g),
        |m AS (SELECT d.user_id, d.version, count(*) AS n_events
        |      FROM e ev JOIN dim d ON ev.user_id = d.user_id
        |        AND ev.ts >= d.valid_from
        |        AND (d.valid_to IS NULL OR ev.ts < d.valid_to)
        |      GROUP BY d.user_id, d.version)
        |SELECT count(*) AS n_versions_hit,
        |  CAST(sum(n_events) AS BIGINT) AS n_events_matched,
        |  max(n_events) AS max_events_per_version,
        |  CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS singleton_versions
        |FROM m""".stripMargin,

    "q105_transitions" ->
      """WITH e AS (
        |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id
        |  FROM events),
        |p AS (SELECT event_type AS from_type,
        |        lead(event_type) OVER (PARTITION BY user_id
        |          ORDER BY ts, event_id) AS to_type
        |      FROM e)
        |SELECT from_type, to_type, count(*) AS cnt FROM p
        |WHERE to_type IS NOT NULL
        |GROUP BY from_type, to_type ORDER BY from_type, to_type""".stripMargin,

    "q97_agg_salted" ->
      """SELECT event_type,
        | CAST(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_value,
        | count(*) AS cnt
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q133_rate_anomaly" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr,
        |    count(*) AS cnt
        |  FROM events GROUP BY event_type, hr),
        |stats AS (
        |  SELECT event_type, count(*) AS n_hours,
        |    CAST(sum(cnt) AS BIGINT) AS s1,
        |    CAST(sum(cnt * cnt) AS BIGINT) AS s2
        |  FROM hourly GROUP BY event_type),
        |j AS (
        |  SELECT h.event_type, h.hr, h.cnt,
        |    s1::DOUBLE / n_hours AS mean,
        |    (s2::DOUBLE - s1::DOUBLE * s1 / n_hours) / n_hours AS variance
        |  FROM hourly h JOIN stats s USING (event_type)),
        |z AS (
        |  SELECT event_type, hr, cnt, mean,
        |    (cnt - mean) / sqrt(variance) AS z
        |  FROM j WHERE variance > 0)
        |SELECT event_type, hr, cnt,
        |  round(mean, 6) AS mean_cnt, round(z, 6) AS zscore
        |FROM z WHERE abs(z) >= 2
        |ORDER BY event_type, hr""".stripMargin,

    // q158: the lag/running-sum sessionization replayed in window SQL;
    // 28800000000 us = the engine's SessionGapUs (8h). DuckDB's `/` on
    // integers is float division, so the floor+CAST mirrors Spark's
    // floor(long/long-as-double) exactly (values ≪ 2^53).
    "q158_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type
        |  FROM events),
        |x AS (SELECT user_id, ts, event_id, event_type,
        |        lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |          AS prev_ts
        |      FROM e),
        |y AS (SELECT *, CASE WHEN prev_ts IS NULL
        |          OR epoch_us(ts) - epoch_us(prev_ts) > 28800000000
        |        THEN 1 ELSE 0 END AS new_s
        |      FROM x),
        |z AS (SELECT *, CAST(sum(new_s) OVER (PARTITION BY user_id
        |          ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
        |          AS BIGINT) AS session_idx
        |      FROM y)
        |SELECT user_id, session_idx, count(*) AS n_events,
        |  min(ts) AS session_start,
        |  CAST(floor((epoch_us(max(ts)) - epoch_us(min(ts))) / 1000000)
        |    AS BIGINT) AS duration_s,
        |  count(DISTINCT event_type) AS n_types
        |FROM z GROUP BY user_id, session_idx
        |ORDER BY user_id, session_idx""".stripMargin,

    // q161: identical integer sufficient statistics, identical formula
    // (never the engine's regr_slope builtin, whose accumulation order
    // could differ); `//` = exact integer epoch-hour on positive
    // epochs; x centered at the per-type min hour exactly as the
    // engine does (shift-invariance is exact in integers)
    "q161_trend_slope" ->
      """WITH hourly0 AS (
        |  SELECT event_type,
        |    epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP)))
        |      // 3600000000 AS xr,
        |    count(*) AS y
        |  FROM events GROUP BY 1, 2),
        |hourly AS (
        |  SELECT event_type,
        |    xr - min(xr) OVER (PARTITION BY event_type) AS x, y
        |  FROM hourly0),
        |st AS (
        |  SELECT event_type, count(*) AS n_hours,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(x * y) AS BIGINT) AS sxy
        |  FROM hourly GROUP BY event_type),
        |sl AS (
        |  SELECT event_type, n_hours, sy,
        |    (n_hours * sxy - sx * sy)::DOUBLE
        |      / (n_hours * sxx - sx * sx) AS slope
        |  FROM st WHERE n_hours * sxx - sx * sx > 0)
        |SELECT event_type, n_hours, sy AS n_events,
        |  round(slope, 6) AS slope_per_hour,
        |  round(slope * 24, 6) AS slope_per_day
        |FROM sl ORDER BY event_type""".stripMargin,

    // q170: the same sorted fold — list(… ORDER BY age) mirrors the
    // engine's array_sort, the decay constant assembles in-engine
    "q170_decay_weighted" ->
      """WITH hourly AS (
        |  SELECT event_type,
        |    epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP)))
        |      // 3600000000 AS hr,
        |    count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |mx AS (SELECT max(hr) AS mx FROM hourly),
        |a AS (SELECT event_type, CAST(mx - hr AS BIGINT) AS age, cnt
        |      FROM hourly CROSS JOIN mx)
        |SELECT event_type, CAST(sum(cnt) AS BIGINT) AS n_events,
        |  round(list_reduce(list_prepend(0.0,
        |    list(cnt::DOUBLE * exp(age::DOUBLE * (-ln(2) / 24))
        |         ORDER BY age, cnt)),
        |    (acc, v) -> acc + v), 6) AS decayed_count
        |FROM a GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    // q175: same first-view/first-purchase-after collapse, same exact
    // integer rank cuts — never an interpolating quantile builtin
    "q175_conversion_lag" ->
      """WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
        |           FROM events),
        |v AS (SELECT user_id, min(ts) AS v_ts FROM e
        |      WHERE event_type = 'view' GROUP BY user_id),
        |lat AS (
        |  SELECT e.user_id,
        |    CAST(floor((epoch_us(min(e.ts)) - epoch_us(min(v.v_ts)))
        |      / 1000000) AS BIGINT) AS lat_s
        |  FROM e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts >= v.v_ts
        |  GROUP BY e.user_id),
        |r AS (SELECT lat_s,
        |    row_number() OVER (ORDER BY lat_s, user_id) AS rn,
        |    count(*) OVER () AS n
        |  FROM lat)
        |SELECT CAST(max(n) AS BIGINT) AS n_converted,
        |  CAST(min(CASE WHEN rn * 2 >= n THEN lat_s END) AS BIGINT) AS p50_s,
        |  CAST(min(CASE WHEN rn * 10 >= n * 9 THEN lat_s END) AS BIGINT)
        |    AS p90_s,
        |  CAST(max(lat_s) AS BIGINT) AS max_s
        |FROM r""".stripMargin,

    // q182: decimal partials and the decimal running sum, cast at
    // display (q97's exactness twin in window form)
    "q182_cohort_ltv" ->
      """WITH e AS (SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |    event_type, CAST(value AS DECIMAL(18,4)) AS v FROM events),
        |cohorts AS (SELECT user_id, min(day) AS cohort_day
        |            FROM e GROUP BY user_id),
        |weekly AS (
        |  SELECT cohort_day,
        |    CAST(floor(date_diff('day', cohort_day, day) / 7) AS BIGINT)
        |      AS week_offset,
        |    count(*) AS n_purchases,
        |    CAST(sum(v) AS DECIMAL(18,4)) AS wk_value
        |  FROM e JOIN cohorts USING (user_id)
        |  WHERE event_type = 'purchase'
        |  GROUP BY 1, 2)
        |SELECT cohort_day, week_offset, n_purchases,
        |  CAST(wk_value AS DOUBLE) AS week_value,
        |  CAST(CAST(sum(wk_value) OVER (PARTITION BY cohort_day
        |    ORDER BY week_offset ROWS UNBOUNDED PRECEDING)
        |    AS DECIMAL(18,4)) AS DOUBLE) AS ltv_cum
        |FROM weekly ORDER BY cohort_day, week_offset""".stripMargin,

    // q183: the same exact-micros window cut
    "q183_funnel_windowed" ->
      """WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
        |           FROM events),
        |v AS (SELECT user_id, min(ts) AS v_ts FROM e
        |      WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT DISTINCT e.user_id
        |  FROM e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts >= v.v_ts
        |    AND epoch_us(e.ts) - epoch_us(v.v_ts) <= 7::BIGINT * 86400 * 1000000)
        |SELECT (SELECT count(*) FROM v) AS n_viewers,
        |  (SELECT count(*) FROM c) AS n_converted_7d,
        |  round((SELECT count(*) FROM c)::DOUBLE
        |    / (SELECT count(*) FROM v), 6) AS cvr_7d""".stripMargin,

    // q186: q158's session replay + ordered list_agg truncated to 5
    "q186_top_journeys" ->
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type
        |  FROM events),
        |x AS (SELECT *, lag(ts) OVER (PARTITION BY user_id
        |        ORDER BY ts, event_id) AS prev_ts FROM e),
        |y AS (SELECT *, CASE WHEN prev_ts IS NULL
        |          OR epoch_us(ts) - epoch_us(prev_ts) > 28800000000
        |        THEN 1 ELSE 0 END AS new_s FROM x),
        |z AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id
        |        ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
        |        AS session_idx FROM y),
        |j AS (SELECT array_to_string(
        |        (list(event_type ORDER BY ts, event_id))[1:5], '>')
        |        AS journey
        |      FROM z GROUP BY user_id, session_idx)
        |SELECT journey, count(*) AS n_sessions
        |FROM j GROUP BY journey
        |ORDER BY n_sessions DESC, journey LIMIT 20""".stripMargin,
  )
}
