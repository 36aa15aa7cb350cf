package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Scans, projections, filters (SURVEY.md §2b q01–q02).
  * Declarative DataFrame ops so Catalyst pushes predicates + prunes columns
  * down to the parquet scan — verified via explain() (PushedFilters /
  * ReadSchema). */
object ScanQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_scan_project" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .select(
          col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"), col("l_discount"),
          (dec("l_extendedprice") * (lit(1) - dec("l_discount"))).cast(D)
            .cast("double").as("revenue"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    "q02_filter" -> { (s, dir) =>
      t(s, dir, "orders")
        .filter(
          col("o_orderstatus").isin("O", "F") &&
          col("o_orderdate").between(
            lit("1996-01-01 00:00:00").cast("timestamp"),
            lit("1998-12-31 00:00:00").cast("timestamp")) &&
          (col("o_orderpriority").like("1-%") ||
            !(col("o_totalprice") < 50000.0)) &&
          col("o_custkey").isNotNull)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderdate", "o_orderpriority")
        .orderBy("o_orderkey")
    },
  )

  def oracle: Map[String, String] = Map(
    "q01_scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount,
        | CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS revenue
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q02_filter" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        |FROM orders
        |WHERE o_orderstatus IN ('O','F')
        |  AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1998-12-31 00:00:00'
        |  AND (o_orderpriority LIKE '1-%' OR NOT (o_totalprice < 50000.0))
        |  AND o_custkey IS NOT NULL
        |ORDER BY o_orderkey""".stripMargin,
  )
}
