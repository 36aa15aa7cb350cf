package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Aggregations (SURVEY.md §2b q13–q21). All money/qty aggregation over
  * DECIMAL per contract D2 (exact, accumulation-order-free); Spark executes
  * these as two-phase partial+final HashAggregate — map-side combine means
  * the shuffle carries one row per (partition, group), which is what keeps
  * this scalable at 100 TB. */
object AggQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q13_agg_global" -> { (s, dir) =>
      t(s, dir, "lineitem").agg(
        count(lit(1)).as("cnt_all"),
        count(col("l_quantity")).as("cnt_qty"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        sum(dec("l_quantity")).cast(D).cast("double").as("sum_qty"),
        (sum(dec("l_quantity")) / count(lit(1))).cast(D).cast("double")
          .as("avg_qty"))
    },

    // Flagship: TPC-H Q1 pricing-summary shape over the fixture lineitem.
    "q14_agg_group" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(dec("l_quantity")).cast(D).cast("double").as("sum_qty"),
          sum(dec("l_extendedprice")).cast(D).cast("double")
            .as("sum_base_price"),
          sum(dec("l_extendedprice") * (lit(1) - dec("l_discount"))).cast(D)
            .cast("double").as("sum_disc_price"),
          sum((dec("l_extendedprice") * (lit(1) - dec("l_discount"))).cast(D6)
              * (lit(1) + dec("l_tax"))).cast(D6)
            .cast("double").as("sum_charge"),
          (sum(dec("l_quantity")) / count(lit(1))).cast(D).cast("double")
            .as("avg_qty"),
          (sum(dec("l_extendedprice")) / count(lit(1))).cast(D).cast("double")
            .as("avg_price"),
          (sum(dec("l_discount")) / count(lit(1))).cast(D).cast("double")
            .as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    "q15_agg_distinct" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_suppkey")).as("distinct_supp"),
          sum_distinct(dec("l_quantity")).cast(D).cast("double")
            .as("sum_dist_qty"))
        .orderBy("l_returnflag")
    },

    // SQL ROLLUP: the Dataset `rollup()` API trips Spark 4.1.2's
    // ambiguous-self-join detector whenever the child contains a join
    // (even after re-projection/renames); the parser path resolves by
    // plan position and has no such issue.
    "q16_agg_rollup" -> { (s, dir) =>
      t(s, dir, "region")
        .join(t(s, dir, "nation"), col("r_regionkey") === col("n_regionkey"))
        .join(t(s, dir, "customer"), col("c_nationkey") === col("n_nationkey"))
        .createOrReplaceTempView("region_nation_customer")
      s.sql(
        """SELECT r_name, n_name, count(*) AS cust_cnt,
          |  CAST(grouping_id() AS INT) AS gid
          |FROM region_nation_customer
          |GROUP BY ROLLUP (r_name, n_name)
          |ORDER BY gid, r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin)
    },

    "q17_agg_cube" -> { (s, dir) =>
      t(s, dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("cnt"), grouping_id().cast("int").as("gid"))
        .orderBy(col("gid"), col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    },

    // Explicit GROUPING SETS through the SQL parser path.
    "q18_agg_gsets" -> { (s, dir) =>
      t(s, dir, "orders").createOrReplaceTempView("orders_v")
      s.sql(
        """SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
          |  CAST(grouping_id() AS INT) AS gid
          |FROM orders_v
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          |ORDER BY gid, o_orderstatus ASC NULLS FIRST,
          |  o_orderpriority ASC NULLS FIRST""".stripMargin)
    },

    "q19_agg_having" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_suppkey")
        .agg(sum(dec("l_quantity")).cast(D).as("sum_qty"),
          count(lit(1)).as("n_items"))
        .filter(col("sum_qty") > lit(100).cast(D))
        .withColumn("sum_qty", col("sum_qty").cast("double"))
        .orderBy("l_suppkey")
    },

    // Approx distinct (HLL++). The raw estimate is implementation-
    // defined (D6), so it can never hash-match a DuckDB twin — but the
    // sketch's CONTRACT can: the estimate must sit within 3·rsd (rsd =
    // 0.05, approx_count_distinct's default) of the exact count. r13
    // moves that contract INTO the gated output: the key emits the
    // exact count plus the engine-computed `within_3rsd` boolean, and
    // the oracle replays the exact count with a literal TRUE — so a
    // broken sketch hash-fails the driver gate instead of hiding
    // behind an oracle exemption (the D6 rationale is unchanged; the
    // estimate itself still never crosses engines). EdgeCaseSpec pins
    // that the boolean is honest (recomputed from a separate
    // approx+exact pass), so it cannot degenerate into lit(true).
    // Cost note: the exact countDistinct twin rides the same shuffle —
    // at 100 TB this key is the AUDIT of the sketch (run on samples /
    // fixtures); production reach-for-HLL paths drop the twin.
    "q20_agg_hll" -> { (s, dir) =>
      loadEvents(s, dir)
        .groupBy("event_type")
        .agg(approx_count_distinct(col("user_id")).as("approx_users"),
          countDistinct(col("user_id")).cast("long").as("exact_users"))
        .select(col("event_type"), col("exact_users"),
          (abs(col("approx_users") - col("exact_users"))
            <= lit(0.15) * col("exact_users")).as("within_3rsd"))
        .orderBy("event_type")
    },

    // Sample variance/stddev from exact decimal moments (n, Σx, Σx²) with
    // one final double op — accumulation-order-free on both engines.
    "q21_agg_stats" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          sum(dec("l_quantity")).cast(D).as("sx"),
          sum((dec("l_quantity") * dec("l_quantity")).cast(D)).cast(D)
            .as("sxx"))
        .select(
          col("l_returnflag"), col("n"),
          round(
            (col("sxx").cast("double")
              - col("sx").cast("double") * col("sx").cast("double")
                / col("n"))
              / (col("n") - 1), 6).as("var_qty"),
          round(
            sqrt((col("sxx").cast("double")
              - col("sx").cast("double") * col("sx").cast("double")
                / col("n"))
              / (col("n") - 1)), 6).as("stddev_qty"))
        .orderBy("l_returnflag")
    },

    // Equi-width histogram over l_extendedprice: one hash aggregation on
    // a bounded bucket key (bucket count is fixed by the literal width,
    // not the data size), so at 100 TB this is a map-side-combined agg
    // shuffling O(buckets) rows per partition. floor(x / width) on
    // doubles is bit-identical cross-engine; money sums stay DECIMAL.
    "q95_histogram" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(floor(col("l_extendedprice") / 5000.0).cast("long")
          .as("bucket"))
        .agg(
          count(lit(1)).as("cnt"),
          sum(dec("l_extendedprice")).cast(D).cast("double").as("sum_price"),
          min(col("l_extendedprice")).as("min_price"),
          max(col("l_extendedprice")).as("max_price"))
        .orderBy("bucket")
    },
  )

  def oracle: Map[String, String] = Map(
    "q13_agg_global" ->
      """SELECT count(*) AS cnt_all, count(l_quantity) AS cnt_qty,
        | min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
        | CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_qty,
        | CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) / count(*) AS DECIMAL(18,4)) AS DOUBLE) AS avg_qty
        |FROM lineitem""".stripMargin,

    // sum_charge routes its final decimal→double through VARCHAR:
    // DuckDB 1.0 converts DECIMAL to DOUBLE as scaled-int64 → double →
    // divide, which DOUBLE-ROUNDS once the scaled value passes 2^53 —
    // a scale-6 sum crosses that at ~9.0e9 (the sf1 scale point caught
    // it at 5.2e10; Spark's BigDecimal path is correctly rounded).
    // String → double is correctly rounded in DuckDB, and the detour is
    // value-identical below 2^53. Scale-4 partials clear 2^53 until
    // ~9.0e11 per group, far above any fixture sum — left direct.
    "q14_agg_group" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_qty,
        | CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_base_price,
        | CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_disc_price,
        | CAST(CAST(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,6)) * (1 + CAST(l_tax AS DECIMAL(18,4)))) AS DECIMAL(18,6)) AS VARCHAR) AS DOUBLE) AS sum_charge,
        | CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) / count(*) AS DECIMAL(18,4)) AS DOUBLE) AS avg_qty,
        | CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) / count(*) AS DECIMAL(18,4)) AS DOUBLE) AS avg_price,
        | CAST(CAST(sum(CAST(l_discount AS DECIMAL(18,4))) / count(*) AS DECIMAL(18,4)) AS DOUBLE) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q15_agg_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_suppkey) AS distinct_supp,
        | CAST(CAST(sum(DISTINCT CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_dist_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q16_agg_rollup" ->
      """SELECT r_name, n_name, count(*) AS cust_cnt,
        | CAST(GROUPING(r_name, n_name) AS INTEGER) AS gid
        |FROM region
        | JOIN nation ON r_regionkey = n_regionkey
        | JOIN customer ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY gid, r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin,

    "q17_agg_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
        | CAST(GROUPING(o_orderstatus, o_orderpriority) AS INTEGER) AS gid
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY gid, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,

    "q18_agg_gsets" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
        | CAST(GROUPING(o_orderstatus, o_orderpriority) AS INTEGER) AS gid
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY gid, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,

    "q19_agg_having" ->
      """SELECT l_suppkey,
        | CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_qty,
        | count(*) AS n_items
        |FROM lineitem GROUP BY l_suppkey
        |HAVING CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(18,4)) > 100
        |ORDER BY l_suppkey""".stripMargin,

    // q20: the oracle replays the EXACT side and asserts the engine's
    // sketch-contract boolean with a literal TRUE — the estimate never
    // crosses engines (D6), but a sketch outside its 3·rsd bound now
    // hash-fails the gate instead of sitting oracle-exempt
    "q20_agg_hll" ->
      """SELECT event_type,
        |  count(DISTINCT user_id) AS exact_users,
        |  TRUE AS within_3rsd
        |FROM events GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "q21_agg_stats" ->
      """WITH m AS (
        |  SELECT l_returnflag, count(*) AS n,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS sx,
        |    CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,4)) AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS sxx
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        | ROUND((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) / (n - 1), 6) AS var_qty,
        | ROUND(SQRT((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) / (n - 1)), 6) AS stddev_qty
        |FROM m ORDER BY l_returnflag""".stripMargin,

    "q95_histogram" ->
      """SELECT CAST(floor(l_extendedprice / 5000.0) AS BIGINT) AS bucket,
        | count(*) AS cnt,
        | CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_price,
        | min(l_extendedprice) AS min_price,
        | max(l_extendedprice) AS max_price
        |FROM lineitem GROUP BY 1 ORDER BY bucket""".stripMargin,
  )
}
