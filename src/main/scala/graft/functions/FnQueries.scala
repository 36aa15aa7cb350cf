package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Scalar function surface: string / date / math / conditional / array /
  * map / json / generator (SURVEY.md §2b q31–q38).
  *
  * All built-in `functions._` — codegen'd, stay inside WholeStageCodegen;
  * no UDFs in these paths (UDF surface is q47–q49). Int-typed Spark
  * results (length/year/datediff/…) are cast to LONG so written parquet
  * matches DuckDB's BIGINT. The JSON oracle twin uses regexp, not a JSON
  * extension, so it runs on any stock DuckDB. */
object FnQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q31_fn_string" -> { (s, dir) =>
      t(s, dir, "part")
        .select(col("p_partkey"),
          concat(col("p_brand"), lit(":"), col("p_name")).as("brand_name"),
          upper(col("p_name")).as("uname"),
          lower(col("p_type")).as("ltype"),
          substring(col("p_name"), 1, 5).as("name5"),
          length(col("p_name")).cast("long").as("name_len"),
          trim(col("p_name")).as("trimmed"),
          regexp_replace(col("p_name"), " ", "_").as("snake_name"),
          lpad(col("p_brand"), 10, "*").as("brand_pad"),
          regexp_extract(col("p_brand"), "Brand#(\\d+)", 1).as("brand_num"),
          col("p_name").like("%bolt%").as("is_bolt"))
        .orderBy("p_partkey")
    },

    "q32_fn_date" -> { (s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderdate"),
          year(col("o_orderdate")).cast("long").as("yr"),
          month(col("o_orderdate")).cast("long").as("mo"),
          dayofmonth(col("o_orderdate")).cast("long").as("dom"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          date_add(col("o_orderdate").cast("date"), 30).as("plus30"),
          datediff(col("o_orderdate").cast("date"),
            lit("1995-01-01").cast("date")).cast("long").as("days_since"))
        .orderBy("o_orderkey")
    },

    "q33_fn_math" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          abs(lit(-1) * col("l_quantity")).as("abs_qty"),
          ceil(col("l_extendedprice")).as("ceil_price"),
          floor(col("l_extendedprice")).as("floor_price"),
          round(dec("l_extendedprice") * dec("l_discount"), 2).cast(D)
            .cast("double").as("disc_amt"),
          pow(lit(2.0), col("l_linenumber")).as("pow2"),
          round(sqrt(col("l_quantity")), 6).as("sqrt_qty"),
          (col("l_partkey") % 7).as("mod7"),
          signum(col("l_discount") - 0.05).cast("int").as("sign_disc"),
          greatest(col("l_quantity"), col("l_discount") * 100).as("biggest"),
          least(col("l_quantity"), col("l_discount") * 100).as("smallest"))
        // TOTAL order over every output column — (l_orderkey,
        // l_linenumber) alone is not unique in lineitem (see q01);
        // remaining ties are fully-identical rows
        .orderBy("l_orderkey", "l_linenumber", "abs_qty", "ceil_price",
          "floor_price", "disc_amt", "mod7", "sign_disc", "biggest",
          "smallest")
    },

    "q34_fn_cond_cast" -> { (s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderkey"),
          when(col("o_orderstatus") === "O", "open")
            .when(col("o_orderstatus") === "F", "finished")
            .otherwise("partial").as("status_word"),
          coalesce(nullif(col("o_orderpriority"), lit("4-NOT SPECIFIED")),
            lit("unspecified")).as("prio"),
          when(col("o_totalprice") > 100000, "big").otherwise("small")
            .as("size_class"),
          col("o_orderkey").cast("string").as("key_str"),
          col("o_orderkey").cast("string").cast("long").as("key_rt"),
          dec("o_totalprice").cast("double").as("price_dec"),
          col("o_orderdate").cast("date").as("order_date"))
        .orderBy("o_orderkey")
    },

    "q35_fn_array" -> { (s, dir) =>
      val toks = split(col("text"), " ")
      tWide(s, dir, "documents")
        .select(col("doc_id"),
          size(toks).cast("long").as("n_tokens"),
          array_contains(toks, "data").as("has_data"),
          array_join(slice(sort_array(toks), 1, 3), ",").as("first3_sorted"))
        .orderBy("doc_id")
    },

    // Map construction from per-lang counts, projected back to scalars so
    // the oracle only has to reproduce values, not MapType itself.
    "q36_fn_map" -> { (s, dir) =>
      tWide(s, dir, "documents")
        .groupBy("lang").agg(count(lit(1)).as("cnt"))
        .agg(map_from_entries(
          sort_array(collect_list(struct(col("lang"), col("cnt"))))).as("m"))
        .select(
          concat_ws(",", map_keys(col("m"))).as("langs"),
          // try_: ANSI element_at throws on a missing key, the oracle's
          // scalar subquery yields NULL — match the oracle
          expr("try_element_at(m, 'en')").as("en_cnt"),
          size(col("m")).cast("long").as("n_langs"))
    },

    // Direct heir of the reference's JSON parsing (utils/utils/secrets.py:44
    // json.loads of a fetched config string → here from_json over a column).
    "q37_fn_json" -> { (s, dir) =>
      loadEvents(s, dir)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"),
          from_json(col("props"), lit("k INT")).getField("k").cast("long")
            .as("k2"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"),
          sum(col("k")).cast("long").as("sum_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"),
          sum(col("k2")).cast("long").as("sum_k2"))
        .orderBy("event_type")
    },

    "q38_explode" -> { (s, dir) =>
      tWide(s, dir, "documents")
        .select(posexplode(split(col("text"), " ")).as(Seq("pos", "token")))
        .groupBy("token")
        .agg(count(lit(1)).as("cnt"), sum("pos").cast("long").as("sum_pos"))
        .orderBy(desc("cnt"), col("token"))
        .limit(20)
    },
  )

  def oracle: Map[String, String] = Map(
    "q31_fn_string" ->
      """SELECT p_partkey,
        | p_brand || ':' || p_name AS brand_name,
        | upper(p_name) AS uname, lower(p_type) AS ltype,
        | substring(p_name, 1, 5) AS name5,
        | length(p_name) AS name_len,
        | trim(p_name) AS trimmed,
        | regexp_replace(p_name, ' ', '_', 'g') AS snake_name,
        | lpad(p_brand, 10, '*') AS brand_pad,
        | regexp_extract(p_brand, 'Brand#(\d+)', 1) AS brand_num,
        | p_name LIKE '%bolt%' AS is_bolt
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q32_fn_date" ->
      """SELECT o_orderkey, o_orderdate,
        | year(o_orderdate) AS yr, month(o_orderdate) AS mo,
        | dayofmonth(o_orderdate) AS dom,
        | CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        | CAST(o_orderdate AS DATE) + 30 AS plus30,
        | datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q33_fn_math" ->
      """SELECT l_orderkey, l_linenumber,
        | abs(-1 * l_quantity) AS abs_qty,
        | CAST(ceil(l_extendedprice) AS BIGINT) AS ceil_price,
        | CAST(floor(l_extendedprice) AS BIGINT) AS floor_price,
        | CAST(CAST(round(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(18,4)), 2) AS DECIMAL(18,4)) AS DOUBLE) AS disc_amt,
        | power(2.0, l_linenumber) AS pow2,
        | round(sqrt(l_quantity), 6) AS sqrt_qty,
        | l_partkey % 7 AS mod7,
        | CAST(sign(l_discount - 0.05) AS INTEGER) AS sign_disc,
        | greatest(l_quantity, l_discount * 100) AS biggest,
        | least(l_quantity, l_discount * 100) AS smallest
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, abs_qty, ceil_price,
        |  floor_price, disc_amt, mod7, sign_disc, biggest, smallest""".stripMargin,

    "q34_fn_cond_cast" ->
      """SELECT o_orderkey,
        | CASE WHEN o_orderstatus = 'O' THEN 'open'
        |      WHEN o_orderstatus = 'F' THEN 'finished'
        |      ELSE 'partial' END AS status_word,
        | COALESCE(NULLIF(o_orderpriority, '4-NOT SPECIFIED'), 'unspecified') AS prio,
        | CASE WHEN o_totalprice > 100000 THEN 'big' ELSE 'small' END AS size_class,
        | CAST(o_orderkey AS VARCHAR) AS key_str,
        | CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS key_rt,
        | CAST(CAST(o_totalprice AS DECIMAL(18,4)) AS DOUBLE) AS price_dec,
        | CAST(o_orderdate AS DATE) AS order_date
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q35_fn_array" ->
      """SELECT doc_id,
        | len(string_split(text, ' ')) AS n_tokens,
        | list_contains(string_split(text, ' '), 'data') AS has_data,
        | array_to_string(list_sort(string_split(text, ' '))[1:3], ',') AS first3_sorted
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q36_fn_map" ->
      """WITH c AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang)
        |SELECT string_agg(lang, ',' ORDER BY lang) AS langs,
        |  (SELECT cnt FROM c WHERE lang = 'en') AS en_cnt,
        |  count(*) AS n_langs
        |FROM c""".stripMargin,

    "q37_fn_json" ->
      """WITH e AS (SELECT event_type,
        |  CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS k FROM events)
        |SELECT event_type, count(*) AS cnt,
        | CAST(sum(k) AS BIGINT) AS sum_k, min(k) AS min_k, max(k) AS max_k,
        | CAST(sum(k) AS BIGINT) AS sum_k2
        |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q38_explode" ->
      """SELECT tk AS token, count(*) AS cnt, CAST(sum(p) AS BIGINT) AS sum_pos
        |FROM (SELECT unnest(string_split(text, ' ')) AS tk,
        |             unnest(range(len(string_split(text, ' ')))) AS p
        |      FROM documents) u
        |GROUP BY tk ORDER BY cnt DESC, tk LIMIT 20""".stripMargin,
  )
}
