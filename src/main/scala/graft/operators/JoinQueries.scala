package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** Joins (SURVEY.md §2b q03–q12).
  *
  * Scale notes: dimension joins (region/nation/supplier) broadcast —
  * Catalyst picks broadcast-hash automatically under the default 10 MB
  * threshold, q12 forces it with an explicit hint. The fact-fact join
  * (orders⋈lineitem) shuffles on the join key; at 100 TB that is the
  * intended sort-merge path (or bucketed co-location when both sides are
  * written bucketed by orderkey). The as-of join (q11) deliberately avoids
  * a per-row range join: it is the union + partitioned-window
  * last-value-carry-forward pattern — one shuffle on user_id, linear work,
  * no candidate explosion. */
object JoinQueries {

  /** 5-table equi-join chain, revenue per nation (TPC-H Q5 shape);
    * `wrapDim` lets q12 force the broadcast path on the dims. */
  private def revenueByNation(s: SparkSession, dir: String,
      wrapDim: DataFrame => DataFrame): DataFrame =
    wrapDim(t(s, dir, "region"))
      .join(wrapDim(t(s, dir, "nation")),
        col("r_regionkey") === col("n_regionkey"))
      .join(t(s, dir, "customer"), col("c_nationkey") === col("n_nationkey"))
      .join(t(s, dir, "orders"), col("o_custkey") === col("c_custkey"))
      .join(t(s, dir, "lineitem"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("r_name", "n_name")
      .agg(
        sum(dec("l_extendedprice") * (lit(1) - dec("l_discount"))).cast(D)
          .cast("double").as("revenue"),
        count(lit(1)).as("n_rows"))
      .orderBy(desc("revenue"), col("n_name"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q03_join_inner" -> { (s, dir) =>
      revenueByNation(s, dir, identity)
    },

    "q04_join_left" -> { (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("o_custkey") === col("c_custkey"),
          "left_outer")
        .groupBy("c_custkey", "c_name")
        .agg(
          count(col("o_orderkey")).as("order_cnt"),
          coalesce(sum(dec("o_totalprice")), lit(0).cast(D)).cast(D)
            .cast("double").as("total_spend"))
        .orderBy("c_custkey")
    },

    // Same semantics as q04, via the right_outer physical path.
    "q05_join_right" -> { (s, dir) =>
      t(s, dir, "orders")
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"),
          "right_outer")
        .groupBy("c_custkey", "c_name")
        .agg(
          count(col("o_orderkey")).as("order_cnt"),
          coalesce(sum(dec("o_totalprice")), lit(0).cast(D)).cast(D)
            .cast("double").as("total_spend"))
        .orderBy("c_custkey")
    },

    "q06_join_full" -> { (s, dir) =>
      val cc = t(s, dir, "customer").groupBy("c_nationkey")
        .agg(count(lit(1)).as("customer_cnt"))
      val sc = t(s, dir, "supplier").groupBy("s_nationkey")
        .agg(count(lit(1)).as("supplier_cnt"))
      cc.join(sc, col("c_nationkey") === col("s_nationkey"), "full_outer")
        .select(
          coalesce(col("c_nationkey"), col("s_nationkey")).as("nationkey"),
          coalesce(col("customer_cnt"), lit(0L)).as("customer_cnt"),
          coalesce(col("supplier_cnt"), lit(0L)).as("supplier_cnt"))
        .orderBy("nationkey")
    },

    "q07_join_semi" -> { (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"),
          "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    },

    // Anti against a filtered build side so the result is non-empty
    // (every customer has ≥1 order in the fixtures, but not every one
    // has an URGENT order).
    "q08_join_anti" -> { (s, dir) =>
      t(s, dir, "customer")
        .join(
          t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    },

    "q09_join_cross" -> { (s, dir) =>
      // region is 5 rows by TPC-H contract at EVERY scale factor —
      // broadcast it explicitly rather than trusting file-size stats
      broadcast(t(s, dir, "region").select("r_name"))
        .crossJoin(
          t(s, dir, "orders").select("o_orderpriority").distinct())
        .orderBy("r_name", "o_orderpriority")
    },

    // Band (theta) join: customers within ±100 of each supplier's balance.
    // abs form, matching BandJoin's residual and the oracle exactly — the
    // subtract form is not IEEE-equivalent at exact band boundaries and is
    // asymmetric in self-joins (see BandJoin.scala).
    "q10_join_theta" -> { (s, dir) =>
      val sup = t(s, dir, "supplier")
      val c = t(s, dir, "customer")
      sup.join(c,
          abs(col("c_acctbal") - col("s_acctbal")) <= 100)
        .groupBy("s_suppkey", "s_name")
        .agg(count(lit(1)).as("cust_cnt"))
        .orderBy("s_suppkey")
    },

    // q10's band semantics through the scalable path: bucketized
    // equi-join (BandJoin) instead of the nested-loop compare matrix —
    // identical result, hash-joinable shape. PlanSpec pins the absence
    // of a nested-loop join.
    "q76_join_band_bucketed" -> { (s, dir) =>
      BandJoin.bandJoin(
          t(s, dir, "supplier"), t(s, dir, "customer"),
          col("s_acctbal"), col("c_acctbal"), 100.0)
        .groupBy("s_suppkey", "s_name")
        .agg(count(lit(1)).as("cust_cnt"))
        .orderBy("s_suppkey")
    },

    // ONE-SIDE-SCALED band join — the probe the sf1 scale point asked
    // for (SURVEY §6b): q10/q76's ±100 pair space grew ~100× on 10×
    // data because BOTH fixture sides scale together, but the realistic
    // 100 TB shape is stream×dimension — a huge fact side against a
    // bounded dim side. This key pins that shape: the dim side is a
    // FIXED key range (s_suppkey ≤ 50 — 51 rows at every fixture scale
    // from sf0.01 up, so the bench scaling column reads fact-side
    // growth directly), the fact side is the full customer table, and
    // the BandJoin bucketization keeps it hash-joinable: the ×3 probe
    // explode lands on the 51-row DIM side, which then BROADCASTS, so
    // the fact side never shuffles at all — measured pairs grow
    // linearly in facts (sf0.01 1 451 → sf1 140 390 on 100× facts).
    // PlanSpec pins BroadcastHashJoin and the absence of any
    // nested-loop/cartesian shape.
    "q193_join_band_oneside" -> { (s, dir) =>
      BandJoin.bandJoin(
          t(s, dir, "supplier").filter(col("s_suppkey") <= 50),
          t(s, dir, "customer"),
          col("s_acctbal"), col("c_acctbal"), 100.0)
        .groupBy("s_suppkey", "s_name")
        .agg(count(lit(1)).as("cust_cnt"),
          sum("c_custkey").cast("long").as("cust_sum"))
        .orderBy("s_suppkey")
    },

    // POINT-IN-INTERVAL join through TIME BINNING — q76's discipline
    // for variable-length time windows (the attribution / maintenance-
    // window / campaign join every event pipeline runs). Spark plans a
    // raw `ts BETWEEN w_start AND w_end` join as a nested loop; binning
    // makes it an EQUI-join: each window explodes to the hour bins it
    // covers (≤ len/bin + 1 rows — windows here are 1–7 h, so ≤ 8), each
    // event maps to its ONE bin, the join keys on the bin and the
    // residual range predicate filters inside the hash match. An event's
    // single bin meets each covering window's distinct bin row exactly
    // once, so no post-join dedup is needed — identical pair set, no
    // O(n·m) compare matrix (PlanSpec pins no nested loop). Windows
    // derive deterministically from the stream itself (event_id % 199
    // anchors, 1–7 h lengths — the q124 synthesis discipline); zero-hit
    // windows still report via the left join. All-integer epoch-micros
    // arithmetic; counts only, so no float-sum ordering hazard.
    "q149_join_interval_binned" -> { (s, dir) =>
      val ev = loadEvents(s, dir)
        .select(col("event_id"), unix_micros(col("ts")).as("us"),
          col("user_id"))
      val iv = ev.filter(col("event_id") % 199 === 0)
        .select(col("event_id").as("window_id"), col("us").as("s_us"),
          (col("us") + (col("event_id") % 7 + 1) * lit(HourUs)).as("e_us"))
      val hits = binnedIntervalHits(iv, ev, HourUs)
        .groupBy("window_id")
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"))
      iv.select("window_id")
        .join(hits, Seq("window_id"), "left_outer")
        .select(col("window_id"),
          coalesce(col("n_events"), lit(0L)).as("n_events"),
          coalesce(col("n_users"), lit(0L)).as("n_users"))
        .orderBy("window_id")
    },

    // q149's attribution as a TRUE STREAM — events arrive as
    // micro-batches and attribute themselves to the STATIC window
    // table in-flight (the always-on campaign/maintenance attribution
    // service): the stream side computes its bin per row (stateless
    // narrow map, no state store, no stream-side shuffle before the
    // join), stream-static equi-joins the pre-exploded window-bin
    // frame through the SAME binnedIntervalHits machinery, and matched
    // (window, event, user) rows append to a parquet sink; the
    // read-back aggregates counts + exact distinct users across all
    // batches (a per-batch distinct would double-count users spanning
    // batches — attribution rows persist, the aggregate runs on the
    // log). Oracle is q149's twin VERBATIM: streamed attribution must
    // reproduce the one-shot batch answer bit-for-bit (the q135/q138
    // twin-sharing discipline).
    "q150_stream_interval_join" -> { (s, dir) =>
      streamIntervalAttribution(s, dir, windowIdCap = None)
    },

    // As-of join: each purchase event matched to the latest click by the
    // same user at or before it. Union + window LVCF: one shuffle on
    // user_id, no range-join blowup — the 100 TB-safe as-of pattern.
    "q11_join_asof" -> { (s, dir) =>
      val ev = loadEvents(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), lit(0).as("tag"), col("event_id"),
          col("ts").as("c_ts"), col("value").as("c_val"))
      val purch = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), lit(1).as("tag"), col("event_id"),
          lit(null).cast("timestamp").as("c_ts"),
          lit(null).cast("double").as("c_val"))
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("tag"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      clicks.unionByName(purch)
        .withColumn("click_ts", last(col("c_ts"), ignoreNulls = true).over(w))
        .withColumn("click_value",
          last(col("c_val"), ignoreNulls = true).over(w))
        .filter(col("tag") === 1)
        .select("event_id", "user_id", "ts", "click_ts", "click_value")
        .orderBy("event_id")
    },

    // q03 semantics with the broadcast-hash path forced on the dims.
    "q12_join_broadcast" -> { (s, dir) =>
      revenueByNation(s, dir, broadcast)
    },

    // Partition-pruned staging read — the Staging.store(partitionBy) path
    // under the oracle gate: orders written hive-partitioned by status,
    // read back with a partition filter; the scan must touch only the
    // matching directories (PartitionFilters pinned by PlanSpec). At
    // 100 TB this is the difference between scanning one partition and
    // scanning the table.
    "q75_partition_prune" -> { (s, dir) =>
      // path is per-(scale factor, session): concurrent Verify/Bench/test
      // JVMs at different sf must not overwrite each other's staged copy
      // mid-scan; stale sessions' copies are reaped by age
      val tmp = System.getProperty("java.io.tmpdir")
      graft.sources.Staging.vacuumStale(s, tmp, "graft_stage_q75_")
      val stage = s"$tmp/graft_stage_q75_" +
        graft.sources.Staging.sessionSuffix(s, dir)
      graft.sources.Staging.store(
        t(s, dir, "orders"), stage, partitionBy = Seq("o_orderstatus"))
      s.read.parquet(stage)
        .filter(col("o_orderstatus") === "F")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"),
          sum(dec("o_totalprice")).cast(D).cast("double").as("total_spend"))
        .orderBy("o_orderpriority")
    },

    // Bucketed co-located fact-fact join — the Staging.storeBucketed path
    // under the oracle gate. Both facts are written bucketed+sorted on the
    // join key (repartitioned to the bucket count first so each bucket is
    // ONE file and reads come back bucket-sorted), then joined from the
    // catalog: the join subtree needs no Exchange and no Sort — the
    // co-location that makes orderkey-grain joins viable at 100 TB. Only
    // the final 5-group agg shuffles. Exchange-freedom pinned by PlanSpec.
    "q69_join_bucketed" -> { (s, dir) =>
      val (lTab, oTab) = bucketedFactTables(s, dir)
      s.table(lTab)
        .join(s.table(oTab),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          sum(dec("l_extendedprice") * (lit(1) - dec("l_discount"))).cast(D)
            .cast("double").as("revenue"))
        .orderBy("o_orderpriority")
    },
  )

  /** Build — or REUSE — q69's bucketed fact pair. Table names are
    * parameterized per (sf-dir, session), the q75 staging discipline:
    * concurrent Verify/Bench/test JVMs share one spark-warehouse/, and
    * unsuffixed names would let one JVM drop another's tables mid-scan.
    * Within a session the names are stable AND the content is a pure
    * function of the input dir, so an existing pair is reused (probes
    * are probe-only after the first call; Bench times the build
    * separately as q69_index_build). The returned plan is lazy, so the
    * tables must outlive the query builder. Dead sessions'
    * uniquely-named leftovers are reaped by age. */
  def bucketedFactTables(s: SparkSession, dir: String,
      rebuild: Boolean = false): (String, String) = {
    val B = 8
    val wh = s.conf.get("spark.sql.warehouse.dir")
    graft.sources.Staging.vacuumStale(s, wh, "graft_lineitem_bkt_")
    graft.sources.Staging.vacuumStale(s, wh, "graft_orders_bkt_")
    val sfx = graft.sources.Staging.sessionSuffix(s, dir)
    val lTab = s"graft_lineitem_bkt_$sfx"
    val oTab = s"graft_orders_bkt_$sfx"
    if (rebuild || !s.catalog.tableExists(lTab)
        || !s.catalog.tableExists(oTab)) {
      // the two bucketed fact tables are INDEPENDENT pipelines into
      // distinct catalog tables — submitted concurrently (guide §2.6,
      // the q190_index_build shape) so the second build's tasks
      // back-fill the first's write tail (r22)
      graft.Par.run(2)(Seq(
        () => graft.sources.Staging.storeBucketed(
          t(s, dir, "lineitem").repartition(B, col("l_orderkey")),
          lTab, Seq("l_orderkey"), B),
        () => graft.sources.Staging.storeBucketed(
          t(s, dir, "orders").repartition(B, col("o_orderkey")),
          oTab, Seq("o_orderkey"), B)))
    }
    (lTab, oTab)
  }

  private val q03Sql =
    """SELECT r_name, n_name,
      | CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(18,4)) AS DOUBLE) AS revenue,
      | count(*) AS n_rows
      |FROM region
      | JOIN nation ON r_regionkey = n_regionkey
      | JOIN customer ON c_nationkey = n_nationkey
      | JOIN orders ON o_custkey = c_custkey
      | JOIN lineitem ON l_orderkey = o_orderkey
      |GROUP BY r_name, n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  private[graft] val HourUs = 3600000000L // 1 h, in epoch micros

  /** q149's candidate machinery: the [half-open) interval frame
    * (`window_id`, `s_us`, `e_us`) explodes to the bins it covers, the
    * point frame (`us`, payload) maps to its ONE bin, and the equi-join
    * on the bin carries the residual range predicate — the identical
    * pair set as `us BETWEEN`, in a hash-joinable shape. All-integer
    * bin arithmetic (`DIV`, never a double floor(x/w) whose rounding
    * could shear a boundary point into the wrong bin); timestamps are
    * epoch micros ≥ 0 (DIV truncates toward zero, = floor on
    * non-negatives). Empty intervals are dropped (they match nothing,
    * and `sequence` would DESCEND on their inverted bin range — the
    * q119 landmine). */
  private[graft] def binnedIntervalHits(iv: DataFrame, ev: DataFrame,
      binUs: Long): DataFrame = {
    val ivBins = iv.filter(col("e_us") > col("s_us"))
      .withColumn("bin",
        explode(sequence(expr(s"s_us DIV $binUs"),
          expr(s"(e_us - 1) DIV $binUs"))))
    val evBins = ev.withColumn("bin", expr(s"us DIV $binUs"))
    ivBins.join(evBins,
        ivBins("bin") === evBins("bin") &&
        col("us") >= col("s_us") && col("us") < col("e_us"))
      .drop("bin")
  }

  /** q150's full streamed attribution pipeline, factored so the
    * one-side counter-probe ([[graft.tools.Probe150]], VERDICT r18
    * item 5) can run the IDENTICAL dataflow with the window side held
    * FIXED while the streamed fact side scales. `windowIdCap = None`
    * is the q150 correctness key (windows from the whole stream —
    * both sides scale together, the adjudicated q10/q76 pair-space
    * class); `Some(cap)` keeps only windows with `event_id < cap`, so
    * cap = one replica stride pins exactly the sf0.1 window set at
    * any replica-scaled fixture — the q193 discipline (fixed dim
    * side, scaling facts) applied to the streamed shape. */
  private[graft] def streamIntervalAttribution(s: SparkSession, dir: String,
      windowIdCap: Option[Long]): DataFrame = {
    import graft.streaming.EventQueries.{freshBase, stageBatches}
    val ev = loadEvents(s, dir)
      .select(col("event_id"), unix_micros(col("ts")).as("us"),
        col("user_id"))
    val ivAll = ev.filter(col("event_id") % 199 === 0)
      .select(col("event_id").as("window_id"), col("us").as("s_us"),
        (col("us") + (col("event_id") % 7 + 1) * lit(HourUs)).as("e_us"))
    val iv = windowIdCap.fold(ivAll)(c => ivAll.filter(col("window_id") < c))
    val base = freshBase(s, dir,
      if (windowIdCap.isEmpty) "q150" else "q150probe")
    val outDir = s"$base/out"
    val src = stageBatches(s, base, Seq(
      ev.filter(col("event_id") % 2 === 0),
      ev.filter(col("event_id") % 2 === 1)))
    graft.Tables.withShufflePartitions(s, 8) {
      val stream = s.readStream
        .schema("event_id BIGINT, us BIGINT, user_id BIGINT")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
      val hits = binnedIntervalHits(iv, stream, HourUs)
        .select(col("window_id"), col("event_id"), col("user_id"))
      val q = graft.streaming.StreamPipelines
        .writeParquetStream(hits, outDir, s"$base/ckpt")
      try q.processAllAvailable() finally q.stop()
    }
    val agg = s.read
      .schema("window_id BIGINT, event_id BIGINT, user_id BIGINT")
      .parquet(outDir)
      .distinct() // exactly-once on replayed files
      .groupBy("window_id")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
    iv.select("window_id")
      .join(agg, Seq("window_id"), "left_outer")
      .select(col("window_id"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("n_users"), lit(0L)).as("n_users"))
      .orderBy("window_id")
  }

  /** DuckDB twin of the interval attribution — shared by q149 (batch
    * binned join) and q150 (streamed), whose outputs are provably
    * identical. */
  private val IntervalJoinSql: String =
    """WITH e AS (SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, user_id FROM events),
      |iv AS (SELECT event_id AS window_id, us AS s_us,
      |         us + (event_id % 7 + 1) * 3600000000 AS e_us
      |       FROM e WHERE event_id % 199 = 0),
      |m AS (SELECT window_id, e.event_id AS eid, e.user_id
      |      FROM iv JOIN e ON e.us >= iv.s_us AND e.us < iv.e_us)
      |SELECT iv.window_id, count(m.eid) AS n_events,
      |  count(DISTINCT m.user_id) AS n_users
      |FROM iv LEFT JOIN m USING (window_id)
      |GROUP BY iv.window_id ORDER BY window_id""".stripMargin

  private val q10Sql =
    """SELECT s_suppkey, s_name, count(*) AS cust_cnt
      |FROM supplier JOIN customer
      |  ON abs(c_acctbal - s_acctbal) <= 100
      |GROUP BY s_suppkey, s_name
      |ORDER BY s_suppkey""".stripMargin

  private val q04Sql =
    """SELECT c_custkey, c_name, count(o_orderkey) AS order_cnt,
      | CAST(CAST(COALESCE(sum(CAST(o_totalprice AS DECIMAL(18,4))), 0) AS DECIMAL(18,4)) AS DOUBLE) AS total_spend
      |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
      |GROUP BY c_custkey, c_name
      |ORDER BY c_custkey""".stripMargin

  def oracle: Map[String, String] = Map(
    // q149: DuckDB runs the RAW range join (its IEJoin handles it) —
    // equality proves the binned equi-join produces the identical
    // point-in-interval pair set
    "q149_join_interval_binned" -> IntervalJoinSql,

    // q150 = q149's answer reached through streamed micro-batch
    // attribution; same SQL, and the gate becomes the streamed ≡
    // one-shot proof
    "q150_stream_interval_join" -> IntervalJoinSql,

    "q03_join_inner" -> q03Sql,
    "q04_join_left" -> q04Sql,
    "q05_join_right" ->
      """SELECT c_custkey, c_name, count(o_orderkey) AS order_cnt,
        | CAST(CAST(COALESCE(sum(CAST(o_totalprice AS DECIMAL(18,4))), 0) AS DECIMAL(18,4)) AS DOUBLE) AS total_spend
        |FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey, c_name
        |ORDER BY c_custkey""".stripMargin,
    "q06_join_full" ->
      """WITH cc AS (SELECT c_nationkey, count(*) AS customer_cnt FROM customer GROUP BY c_nationkey),
        |     sc AS (SELECT s_nationkey, count(*) AS supplier_cnt FROM supplier GROUP BY s_nationkey)
        |SELECT COALESCE(c_nationkey, s_nationkey) AS nationkey,
        |  COALESCE(customer_cnt, 0) AS customer_cnt,
        |  COALESCE(supplier_cnt, 0) AS supplier_cnt
        |FROM cc FULL OUTER JOIN sc ON c_nationkey = s_nationkey
        |ORDER BY nationkey""".stripMargin,
    "q07_join_semi" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q08_join_anti" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "q09_join_cross" ->
      """SELECT r_name, o_orderpriority
        |FROM region CROSS JOIN (SELECT DISTINCT o_orderpriority FROM orders) p
        |ORDER BY r_name, o_orderpriority""".stripMargin,
    "q10_join_theta" -> q10Sql,
    "q76_join_band_bucketed" -> q10Sql,
    // q193: q10's twin restricted to the fixed dim-side key range, plus
    // the fact-key checksum that would catch a dropped/duplicated pair
    "q193_join_band_oneside" ->
      """SELECT s_suppkey, s_name, count(*) AS cust_cnt,
        |  CAST(sum(c_custkey) AS BIGINT) AS cust_sum
        |FROM supplier JOIN customer
        |  ON abs(c_acctbal - s_acctbal) <= 100
        |WHERE s_suppkey <= 50
        |GROUP BY s_suppkey, s_name
        |ORDER BY s_suppkey""".stripMargin,
    "q11_join_asof" ->
      """WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value FROM events)
        |SELECT p.event_id, p.user_id, p.ts,
        | (SELECT c.ts FROM e c WHERE c.user_id = p.user_id AND c.event_type = 'click' AND c.ts <= p.ts
        |    ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS click_ts,
        | (SELECT c.value FROM e c WHERE c.user_id = p.user_id AND c.event_type = 'click' AND c.ts <= p.ts
        |    ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS click_value
        |FROM e p WHERE p.event_type = 'purchase'
        |ORDER BY p.event_id""".stripMargin,
    "q12_join_broadcast" -> q03Sql,
    "q75_partition_prune" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        | CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS total_spend
        |FROM orders
        |WHERE o_orderstatus = 'F'
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q69_join_bucketed" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        | CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(18,4)) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
  )
}
