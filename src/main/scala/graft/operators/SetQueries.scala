package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Sort/limit + set operations (SURVEY.md §2b q26–q30).
  * Global sort+limit compiles to TakeOrderedAndProject (per-partition
  * top-k, no full sort shuffle) — the scalable top-k path. */
object SetQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q26_sort_limit" -> { (s, dir) =>
      t(s, dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
        .orderBy(desc_nulls_last("o_totalprice"),
          asc_nulls_first("o_orderdate"), col("o_orderkey"))
        .limit(100)
    },

    "q27_union_all" -> { (s, dir) =>
      t(s, dir, "customer")
        .select(col("c_nationkey").as("nationkey"), lit("c").as("src"))
        .unionAll(t(s, dir, "supplier")
          .select(col("s_nationkey").as("nationkey"), lit("s").as("src")))
        .groupBy("nationkey", "src")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("nationkey", "src")
    },

    "q28_union" -> { (s, dir) =>
      t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        .union(t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
        .distinct()
        .orderBy("nationkey")
    },

    // Customers that placed both an URGENT and a LOW order.
    "q29_intersect" -> { (s, dir) =>
      val o = t(s, dir, "orders")
      o.filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
        .intersect(
          o.filter(col("o_orderpriority") === "5-LOW").select("o_custkey"))
        .orderBy("o_custkey")
    },

    // Customers with orders but none URGENT (non-empty by construction).
    "q30_except" -> { (s, dir) =>
      val o = t(s, dir, "orders")
      o.select("o_custkey")
        .except(
          o.filter(col("o_orderpriority") === "1-URGENT").select("o_custkey"))
        .orderBy("o_custkey")
    },
  )

  def oracle: Map[String, String] = Map(
    "q26_sort_limit" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate FROM orders
        |ORDER BY o_totalprice DESC NULLS LAST, o_orderdate ASC NULLS FIRST, o_orderkey
        |LIMIT 100""".stripMargin,
    "q27_union_all" ->
      """SELECT nationkey, src, count(*) AS cnt FROM (
        | SELECT c_nationkey AS nationkey, 'c' AS src FROM customer
        | UNION ALL
        | SELECT s_nationkey AS nationkey, 's' AS src FROM supplier) u
        |GROUP BY nationkey, src
        |ORDER BY nationkey, src""".stripMargin,
    "q28_union" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |UNION
        |SELECT s_nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,
    "q29_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
        |ORDER BY o_custkey""".stripMargin,
    "q30_except" ->
      """SELECT o_custkey FROM orders
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY o_custkey""".stripMargin,
  )
}
