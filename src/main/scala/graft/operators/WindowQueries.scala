package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** Window functions (SURVEY.md §2b q22–q25).
  *
  * Every window partitions by a real key (mktsegment / custkey) — no
  * global `Window.orderBy` without partitioning, which would collapse to a
  * single task at scale. Ranking outputs are cast to LONG so the written
  * parquet dtype matches DuckDB's BIGINT window results. */
object WindowQueries {

  private def ordersWithSegment(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q22_win_rank" -> { (s, dir) =>
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
      ordersWithSegment(s, dir)
        .select(col("c_mktsegment"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).cast("long").as("rn"),
          rank().over(w).cast("long").as("rnk"),
          dense_rank().over(w).cast("long").as("drnk"))
        .orderBy("c_mktsegment", "rn")
    },

    "q23_win_frame" -> { (s, dir) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val w3 = w.rowsBetween(-2, 0)
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          sum(dec("o_totalprice")).over(run).cast(D).cast("double")
            .as("running_spend"),
          (sum(dec("o_totalprice")).over(w3) / count(lit(1)).over(w3))
            .cast(D).cast("double").as("mov_avg3"))
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    },

    "q24_win_analytic" -> { (s, dir) =>
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      ordersWithSegment(s, dir)
        .select(col("c_mktsegment"), col("o_orderkey"), col("o_totalprice"),
          lag("o_totalprice", 1).over(w).as("prev_price"),
          lead("o_totalprice", 1).over(w).as("next_price"),
          first("o_totalprice").over(w).as("min_price_so_far"),
          ntile(4).over(w).cast("long").as("quartile"))
        .orderBy("c_mktsegment", "o_totalprice", "o_orderkey")
    },

    // Canonical top-k-per-group: rank in a partitioned window, filter k.
    "q25_topk_group" -> { (s, dir) =>
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
      ordersWithSegment(s, dir)
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select("c_mktsegment", "rn", "o_orderkey", "o_totalprice")
        .orderBy("c_mktsegment", "rn")
    },

    // q25's semantics on the HIGH-cardinality group shape (per
    // customer, not per 5-segment), computed by the bounded-heap
    // aggregate instead of a window: the window form shuffles and
    // sorts every order row; TopKAgg ships <= k (value, id) pairs per
    // (map partition, customer) and merges heaps. Same result, shuffle
    // volume O(groups*k) instead of O(rows) — see
    // graft.plans.TopKAgg scaladoc.
    "q99_topk_agg" -> { (s, dir) =>
      import graft.plans.TopKAgg.topk_agg
      t(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(topk_agg(col("o_totalprice"), col("o_orderkey"), 3).as("top"))
        .select(col("o_custkey"), posexplode(col("top")))
        .select(col("o_custkey"),
          (col("pos") + 1).cast("long").as("rn"),
          col("col.id").as("o_orderkey"),
          col("col.value").as("o_totalprice"))
        .orderBy("o_custkey", "rn")
    },
  )

  def oracle: Map[String, String] = Map(
    "q22_win_rank" ->
      """SELECT c_mktsegment, o_orderkey, o_totalprice,
        | ROW_NUMBER() OVER w AS rn, RANK() OVER w AS rnk, DENSE_RANK() OVER w AS drnk
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY c_mktsegment, rn""".stripMargin,

    "q23_win_frame" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        | CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER
        |   (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(18,4)) AS DOUBLE) AS running_spend,
        | CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER w3
        |   / COUNT(*) OVER w3 AS DECIMAL(18,4)) AS DOUBLE) AS mov_avg3
        |FROM orders
        |WINDOW w3 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,

    "q24_win_analytic" ->
      """SELECT c_mktsegment, o_orderkey, o_totalprice,
        | LAG(o_totalprice, 1) OVER w AS prev_price,
        | LEAD(o_totalprice, 1) OVER w AS next_price,
        | FIRST_VALUE(o_totalprice) OVER w AS min_price_so_far,
        | NTILE(4) OVER w AS quartile
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY o_totalprice, o_orderkey)
        |ORDER BY c_mktsegment, o_totalprice, o_orderkey""".stripMargin,

    "q25_topk_group" ->
      """SELECT c_mktsegment, rn, o_orderkey, o_totalprice FROM (
        | SELECT c_mktsegment, o_orderkey, o_totalprice,
        |  ROW_NUMBER() OVER (PARTITION BY c_mktsegment
        |    ORDER BY o_totalprice DESC, o_orderkey) AS rn
        | FROM orders JOIN customer ON o_custkey = c_custkey) ranked
        |WHERE rn <= 3
        |ORDER BY c_mktsegment, rn""".stripMargin,

    "q99_topk_agg" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        | SELECT o_custkey, o_orderkey, o_totalprice,
        |  ROW_NUMBER() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey) AS rn
        | FROM orders) ranked
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,
  )
}
