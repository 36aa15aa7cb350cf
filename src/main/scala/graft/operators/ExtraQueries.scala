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
    """SELECT c_custkey, c_name, CAST(c_acctbal AS DECIMAL(18,4)) AS bal
      |FROM customer c
      |WHERE CAST(c_acctbal AS DECIMAL(18,4)) >
      |  (SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,4))) / COUNT(*) AS DECIMAL(18,4))
      |   FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
      |ORDER BY c_custkey""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q58_pivot" -> { (s, dir) =>
      t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("f_cnt"),
          coalesce(col("O"), lit(0L)).as("o_cnt"),
          coalesce(col("P"), lit(0L)).as("p_cnt"))
        .orderBy("o_orderpriority")
    },

    // Correlated scalar subquery, decorrelated by Catalyst into an
    // aggregate + join — identical SQL text runs on both engines.
    "q59_subquery" -> { (s, dir) =>
      t(s, dir, "customer").createOrReplaceTempView("customer")
      s.sql(q59Sql)
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

    "q60_percentile" ->
      """SELECT l_returnflag,
        | round(quantile_cont(l_quantity, 0.25), 6) AS p25,
        | round(quantile_cont(l_quantity, 0.5), 6) AS p50,
        | round(quantile_cont(l_quantity, 0.75), 6) AS p75
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
  )
}
