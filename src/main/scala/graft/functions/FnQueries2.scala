package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Second-ring scalar/aggregate function coverage (q64–q67): extended
  * string ops, epoch conversions and time parts, array higher-order
  * functions projected to scalars, and conditional / arg-extrema
  * aggregates. Same determinism discipline as FnQueries. */
object FnQueries2 {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q64_fn_string2" -> { (s, dir) =>
      t(s, dir, "part")
        .select(col("p_partkey"),
          reverse(col("p_name")).as("rev_name"),
          repeat(col("p_brand"), 2).as("brand2"),
          substring(col("p_type"), 1, 3).as("type3"),
          expr("split_part(p_name, ' ', 1)").as("first_word"),
          expr("split_part(p_name, ' ', -1)").as("last_word"),
          instr(col("p_name"), "o").cast("long").as("first_o"),
          col("p_name").startsWith("red").as("is_red"),
          col("p_name").endsWith("bolt").as("is_bolt"),
          ascii(col("p_brand")).cast("long").as("brand_ascii"),
          concat(lit("ch:"), chr(lit(65) + (col("p_size") % 26)))
            .as("size_chr"))
        .orderBy("p_partkey")
    },

    "q65_fn_time" -> { (s, dir) =>
      loadEvents(s, dir)
        .select(col("event_id"), col("ts"),
          unix_timestamp(col("ts")).as("epoch_s"),
          hour(col("ts")).cast("long").as("hh"),
          minute(col("ts")).cast("long").as("mi"),
          second(col("ts")).cast("long").as("ss"),
          // epoch round-trip: back to a (second-truncated) timestamp
          timestamp_seconds(unix_timestamp(col("ts"))).as("ts_rt"))
        .orderBy("event_id")
    },

    // Array higher-order functions projected to scalars so the oracle
    // reproduces values without MapType/ArrayType output comparisons.
    "q66_fn_hof" -> { (s, dir) =>
      val toks = split(col("text"), " ")
      tWide(s, dir, "documents")
        .select(col("doc_id"),
          exists(toks, _.startsWith("a")).as("has_a_word"),
          forall(toks, length(_) > 1).as("all_len_gt1"),
          size(filter(toks, length(_) === 4)).cast("long").as("n_len4"),
          aggregate(toks, lit(0L), (acc, x) => acc + length(x))
            .as("total_chars"))
        .orderBy("doc_id")
    },

    // Conditional + arg-extrema aggregates per order-priority group.
    "q67_agg_cond" -> { (s, dir) =>
      t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
          count_if(col("o_totalprice") > 100000).as("n_big"),
          expr("bool_or(o_orderstatus = 'P')").as("any_pending"),
          expr("bool_and(o_totalprice > 0)").as("all_positive"),
          max_by(col("o_orderkey"), col("o_orderkey")).as("last_key"),
          min_by(col("o_orderkey"), col("o_orderkey")).as("first_key"))
        .orderBy("o_orderpriority")
    },
  )

  def oracle: Map[String, String] = Map(
    "q64_fn_string2" ->
      """SELECT p_partkey,
        | reverse(p_name) AS rev_name,
        | repeat(p_brand, 2) AS brand2,
        | substring(p_type, 1, 3) AS type3,
        | split_part(p_name, ' ', 1) AS first_word,
        | split_part(p_name, ' ', -1) AS last_word,
        | CAST(instr(p_name, 'o') AS BIGINT) AS first_o,
        | starts_with(p_name, 'red') AS is_red,
        | p_name LIKE '%bolt' AS is_bolt,
        | CAST(ascii(p_brand) AS BIGINT) AS brand_ascii,
        | 'ch:' || chr(65 + (p_size % 26)) AS size_chr
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q65_fn_time" ->
      """WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts FROM events)
        |SELECT event_id, ts,
        | CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
        | CAST(hour(ts) AS BIGINT) AS hh,
        | CAST(minute(ts) AS BIGINT) AS mi,
        | CAST(floor(second(ts)) AS BIGINT) AS ss,
        | make_timestamp(CAST(floor(epoch(ts)) AS BIGINT) * 1000000) AS ts_rt
        |FROM e ORDER BY event_id""".stripMargin,

    "q66_fn_hof" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        |SELECT doc_id,
        | len(list_filter(toks, t -> starts_with(t, 'a'))) > 0 AS has_a_word,
        | len(list_filter(toks, t -> NOT (length(t) > 1))) = 0 AS all_len_gt1,
        | CAST(len(list_filter(toks, t -> length(t) = 4)) AS BIGINT) AS n_len4,
        | list_reduce(list_prepend(0::BIGINT,
        |   list_transform(toks, t -> length(t)::BIGINT)), (a, b) -> a + b) AS total_chars
        |FROM d ORDER BY doc_id""".stripMargin,

    "q67_agg_cond" ->
      """SELECT o_orderpriority,
        | count(*) FILTER (o_totalprice > 100000) AS n_big,
        | bool_or(o_orderstatus = 'P') AS any_pending,
        | bool_and(o_totalprice > 0) AS all_positive,
        | arg_max(o_orderkey, o_orderkey) AS last_key,
        | arg_min(o_orderkey, o_orderkey) AS first_key
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
  )
}
