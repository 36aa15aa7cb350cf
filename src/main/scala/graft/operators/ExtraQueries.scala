package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Second-ring relational coverage: pivot, correlated subqueries (through
  * the SQL parser → RewriteCorrelatedScalarSubquery path), exact
  * interpolated percentiles. */
object ExtraQueries {

  /** Shared SQL for q59 — runs verbatim on Spark *and* DuckDB (temp view
    * `customer` on the Spark side, the parquet view on the oracle side). */
  private val q59Sql =
    """SELECT c_custkey, c_name, CAST(CAST(c_acctbal AS DECIMAL(18,4)) AS DOUBLE) AS bal
      |FROM customer c
      |WHERE CAST(c_acctbal AS DECIMAL(18,4)) >
      |  (SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,4))) / COUNT(*) AS DECIMAL(18,4))
      |   FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
      |ORDER BY c_custkey""".stripMargin

  /** Shared by q58 (wide form) and q68 (melted back): per-priority
    * status counts pivoted to columns. */
  private def statusPivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select(col("o_orderpriority"),
        coalesce(col("F"), lit(0L)).as("f_cnt"),
        coalesce(col("O"), lit(0L)).as("o_cnt"),
        coalesce(col("P"), lit(0L)).as("p_cnt"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q58_pivot" -> { (s, dir) =>
      statusPivot(s, dir).orderBy("o_orderpriority")
    },

    // Unpivot (melt): q58's pivot output folded back to long form.
    "q68_unpivot" -> { (s, dir) =>
      statusPivot(s, dir)
        .unpivot(Array(col("o_orderpriority")),
          Array(col("f_cnt"), col("o_cnt"), col("p_cnt")), "status", "cnt")
        .orderBy("o_orderpriority", "status")
    },

    // Correlated scalar subquery, decorrelated by Catalyst into an
    // aggregate + join — identical SQL text runs on both engines.
    "q59_subquery" -> { (s, dir) =>
      t(s, dir, "customer").createOrReplaceTempView("customer")
      s.sql(q59Sql)
    },

    // q11's as-of semantics through the NATIVE operator
    // (graft.plans.AsOfJoinPlan: LogicalPlan + Strategy + SparkPlan) —
    // same oracle as q11, different physical path (co-partitioned
    // sort-merge instead of union + window).
    "q61_asof_native" -> { (s, dir) =>
      val ev = loadEvents(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("c_event_id"),
          col("user_id").as("c_user"), col("ts").as("c_ts"),
          col("value").as("c_value"))
      AsOfJoin.asof(purchases, clicks, "user_id", "c_user", "ts", "c_ts",
          rightTieBreak = Seq("c_event_id"))
        .select(col("event_id"), col("user_id"), col("ts"),
          col("c_ts").as("click_ts"), col("c_value").as("click_value"))
        .orderBy("event_id")
    },

    // Time-interval RANGE frame: per-user trailing-1-hour event count and
    // decimal value sum at every event — the per-entity sliding aggregate
    // that tumbling windows (q39) can't express.
    "q63_win_range" -> { (s, dir) =>
      loadEvents(s, dir).createOrReplaceTempView("events_v")
      s.sql(
        """SELECT event_id, user_id, ts,
          |  COUNT(*) OVER w AS cnt_1h,
          |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DECIMAL(18,4)) AS DOUBLE) AS sum_1h
          |FROM events_v
          |WINDOW w AS (PARTITION BY user_id ORDER BY ts
          |  RANGE BETWEEN INTERVAL '1' HOUR PRECEDING AND CURRENT ROW)
          |ORDER BY event_id""".stripMargin)
    },

    // Exact linear-interpolation percentiles from decimal-sorted doubles.
    "q60_percentile" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(expr("percentile(l_quantity, 0.25)"), 6).as("p25"),
          round(expr("percentile(l_quantity, 0.5)"), 6).as("p50"),
          round(expr("percentile(l_quantity, 0.75)"), 6).as("p75"))
        .orderBy("l_returnflag")
    },

    // Z-order layout audit: Morton-interleave (l_partkey, l_suppkey),
    // bucket rows by z >> 12 (4096-code tiles, i.e. 64x64 rectangles)
    // and report each bucket's (partkey, suppkey) bounding box. Because
    // a contiguous z-range maps to a small RECTANGLE, both dimensions'
    // per-bucket min/max ranges stay within 64 — this is exactly the
    // property that makes zorder-clustered parquet files prunable by
    // row-group stats on EITHER predicate column at 100 TB, where a
    // single-column sort prunes only itself. The interleave is the
    // codegen MortonCode kernel; the bucket agg is a bounded-key
    // two-phase hash agg.
    "q100_zorder_layout" -> { (s, dir) =>
      import graft.plans.GraftExpressions.morton
      t(s, dir, "lineitem")
        .select(pmod(col("l_partkey"), lit(65536)).cast("long").as("px"),
          pmod(col("l_suppkey"), lit(65536)).cast("long").as("py"))
        .withColumn("z", morton(col("px"), col("py")))
        .groupBy(shiftright(col("z"), 12).as("zbucket"))
        .agg(count(lit(1)).as("cnt"),
          min("px").as("min_px"), max("px").as("max_px"),
          min("py").as("min_py"), max("py").as("max_py"))
        .orderBy("zbucket")
    },
  )

  def oracle: Map[String, String] = Map(
    "q58_pivot" ->
      """SELECT o_orderpriority,
        | count(*) FILTER (o_orderstatus = 'F') AS f_cnt,
        | count(*) FILTER (o_orderstatus = 'O') AS o_cnt,
        | count(*) FILTER (o_orderstatus = 'P') AS p_cnt
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q59_subquery" -> q59Sql,

    "q68_unpivot" ->
      """WITH w AS (
        |  SELECT o_orderpriority,
        |   count(*) FILTER (o_orderstatus = 'F') AS f_cnt,
        |   count(*) FILTER (o_orderstatus = 'O') AS o_cnt,
        |   count(*) FILTER (o_orderstatus = 'P') AS p_cnt
        |  FROM orders GROUP BY o_orderpriority)
        |SELECT o_orderpriority, 'f_cnt' AS status, f_cnt AS cnt FROM w
        |UNION ALL
        |SELECT o_orderpriority, 'o_cnt', o_cnt FROM w
        |UNION ALL
        |SELECT o_orderpriority, 'p_cnt', p_cnt FROM w
        |ORDER BY o_orderpriority, status""".stripMargin,

    "q61_asof_native" ->
      """WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value FROM events)
        |SELECT p.event_id, p.user_id, p.ts,
        | (SELECT c.ts FROM e c WHERE c.user_id = p.user_id AND c.event_type = 'click' AND c.ts <= p.ts
        |    ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS click_ts,
        | (SELECT c.value FROM e c WHERE c.user_id = p.user_id AND c.event_type = 'click' AND c.ts <= p.ts
        |    ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS click_value
        |FROM e p WHERE p.event_type = 'purchase'
        |ORDER BY p.event_id""".stripMargin,

    "q63_win_range" ->
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events)
        |SELECT event_id, user_id, ts,
        |  COUNT(*) OVER w AS cnt_1h,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DECIMAL(18,4)) AS DOUBLE) AS sum_1h
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts
        |  RANGE BETWEEN INTERVAL '1' HOUR PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "q60_percentile" ->
      """SELECT l_returnflag,
        | round(quantile_cont(l_quantity, 0.25), 6) AS p25,
        | round(quantile_cont(l_quantity, 0.5), 6) AS p50,
        | round(quantile_cont(l_quantity, 0.75), 6) AS p75
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q100_zorder_layout" -> {
      // the same magic-mask spread chain as MortonCode, in BIGINT SQL
      def spread(e: String): String =
        Seq((8, 0x00FF00FFL), (4, 0x0F0F0F0FL), (2, 0x33333333L),
          (1, 0x55555555L))
          .foldLeft(s"($e & 65535)") { case (acc, (sh, m)) =>
            s"(($acc | ($acc << $sh)) & $m)"
          }
      s"""WITH p AS (
         |  SELECT l_partkey % 65536 AS px, l_suppkey % 65536 AS py
         |  FROM lineitem),
         |b AS (SELECT px, py,
         |  ${spread("px")} | (${spread("py")} << 1) AS z FROM p)
         |SELECT z >> 12 AS zbucket, count(*) AS cnt,
         | min(px) AS min_px, max(px) AS max_px,
         | min(py) AS min_py, max(py) AS max_py
         |FROM b GROUP BY 1 ORDER BY zbucket""".stripMargin
    },
  )
}
