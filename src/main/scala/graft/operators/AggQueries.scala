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
        sum(dec("l_quantity")).cast(D).as("sum_qty"),
        (sum(dec("l_quantity")) / count(lit(1))).cast(D).as("avg_qty"))
    },

    // Flagship: TPC-H Q1 pricing-summary shape over the fixture lineitem.
    "q14_agg_group" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(dec("l_quantity")).cast(D).as("sum_qty"),
          sum(dec("l_extendedprice")).cast(D).as("sum_base_price"),
          sum(dec("l_extendedprice") * (lit(1) - dec("l_discount"))).cast(D)
            .as("sum_disc_price"),
          sum((dec("l_extendedprice") * (lit(1) - dec("l_discount"))).cast(D6)
              * (lit(1) + dec("l_tax"))).cast(D6)
            .as("sum_charge"),
          (sum(dec("l_quantity")) / count(lit(1))).cast(D).as("avg_qty"),
          (sum(dec("l_extendedprice")) / count(lit(1))).cast(D).as("avg_price"),
          (sum(dec("l_discount")) / count(lit(1))).cast(D).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },
  )

  def oracle: Map[String, String] = Map(
    "q13_agg_global" ->
      """SELECT count(*) AS cnt_all, count(l_quantity) AS cnt_qty,
        | min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS sum_qty,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) / count(*) AS DECIMAL(18,4)) AS avg_qty
        |FROM lineitem""".stripMargin,

    "q14_agg_group" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS sum_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS sum_base_price,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(18,4)) AS sum_disc_price,
        | CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,6)) * (1 + CAST(l_tax AS DECIMAL(18,4)))) AS DECIMAL(18,6)) AS sum_charge,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) / count(*) AS DECIMAL(18,4)) AS avg_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) / count(*) AS DECIMAL(18,4)) AS avg_price,
        | CAST(sum(CAST(l_discount AS DECIMAL(18,4))) / count(*) AS DECIMAL(18,4)) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
  )
}
