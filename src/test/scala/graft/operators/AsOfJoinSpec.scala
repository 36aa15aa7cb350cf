package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.Tables

class AsOfJoinSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("native as-of join: latest right row at or before each left row") {
    val sess = spark
    import sess.implicits._
    val trades = Seq(
      (1L, ts("2024-01-01 10:00:05"), "t1"),
      (1L, ts("2024-01-01 10:00:30"), "t2"),
      (2L, ts("2024-01-01 10:00:10"), "t3"), // user 2 has no quotes at all
      (3L, ts("2024-01-01 09:59:59"), "t4")) // before any quote for user 3
      .toDF("user", "trade_ts", "trade_id")
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 10:00:05"), 101.0), // tie with t1 → included (<=)
      (1L, ts("2024-01-01 10:00:20"), 102.0),
      (3L, ts("2024-01-01 10:00:00"), 300.0))
      .toDF("q_user", "q_ts", "price")

    val out = AsOfJoin.asof(trades, quotes,
        "user", "q_user", "trade_ts", "q_ts")
      .select("trade_id", "price")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) null else r.getDouble(1))).toMap

    assert(out === Map(
      "t1" -> 101.0, // equal-ts quote wins over the earlier one
      "t2" -> 102.0,
      "t3" -> null,
      "t4" -> null))
  }

  test("null keys and timestamps yield null matches, no crash") {
    val sess = spark
    import sess.implicits._
    val left = Seq((Some(1L), Some(ts("2024-01-01 10:00:10")), "a"),
      (None, Some(ts("2024-01-01 10:00:10")), "b"),
      (Some(1L), None, "c"))
      .toDF("user", "trade_ts", "trade_id")
    val right = Seq((Some(1L), Some(ts("2024-01-01 10:00:00")), 1.0),
      (None, Some(ts("2024-01-01 10:00:01")), 2.0))
      .toDF("q_user", "q_ts", "price")
    val out = AsOfJoin.asof(left, right, "user", "q_user", "trade_ts", "q_ts")
      .select("trade_id", "price").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getDouble(1)))
      .toMap
    assert(out === Map("a" -> 1.0, "b" -> null, "c" -> null))
  }

  test("rejects non-comparable key types with a clear error") {
    val sess = spark
    import sess.implicits._
    val l = Seq(("u1", ts("2024-01-01 10:00:00"))).toDF("k", "t")
    val r = Seq(("u1", ts("2024-01-01 09:00:00"), 1.0)).toDF("k2", "t2", "v")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asof(l, r, "k", "k2", "t", "t2")
    }
    assert(e.getMessage.contains("integral/timestamp"))
  }

  test("hot key: one user owning half the rows is correct (single-partition bound)") {
    // Skew documentation-as-test: as-of matching is key-clustered, so ALL
    // rows of one key land on ONE partition — AQE cannot split a custom
    // exec node. With user 0 owning 50% of both sides, the join still
    // returns exact results; the per-key work is O(n_left + n_right) after
    // the sort, so the hot partition's bound is the hot key's row count,
    // not its square. See AsOfJoinPlan scaladoc for the 100 TB guidance.
    val sess = spark
    import sess.implicits._
    val n = 2000
    val base = ts("2024-01-01 00:00:00").getTime
    val left = (0 until n).map { i =>
      val u = if (i % 2 == 0) 0L else (i % 7 + 1).toLong // user 0: 50%
      (u, new Timestamp(base + i * 1000L), i.toLong)
    }.toDF("user", "trade_ts", "trade_id").repartition(4)
    val right = (0 until n).map { i =>
      val u = if (i % 2 == 0) 0L else (i % 7 + 1).toLong
      (u, new Timestamp(base + i * 1000L - 500L), i.toLong * 10)
    }.toDF("q_user", "q_ts", "quote_id").repartition(4)

    val out = AsOfJoin.asof(left, right, "user", "q_user", "trade_ts", "q_ts",
        rightTieBreak = Seq("quote_id"))
      .select("trade_id", "quote_id").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(out.size === n)
    // every left row's match is the right row 500ms earlier with the same
    // parity/user stream: for user 0 (even i), latest q_ts <= base+i*1000
    // is the even quote at i*1000-500 → quote_id = i*10
    val hotWrong = (0 until n by 2).filter(i => out(i.toLong) != i * 10L)
    assert(hotWrong.isEmpty, s"hot-key mismatches at $hotWrong")
  }

  test("asofSalted equals asof on hot-key data and spreads the hot key") {
    val sess = spark
    import sess.implicits._
    val n = 2000
    val base = ts("2024-01-01 00:00:00").getTime
    val left = (0 until n).map { i =>
      val u = if (i % 2 == 0) 0L else (i % 7 + 1).toLong // user 0: 50%
      (u, new Timestamp(base + i * 1000L), i.toLong)
    }.toDF("user", "trade_ts", "trade_id").repartition(4)
    val right = (0 until n).map { i =>
      val u = if (i % 2 == 0) 0L else (i % 7 + 1).toLong
      (u, new Timestamp(base + i * 1000L - 500L), i.toLong * 10)
    }.toDF("q_user", "q_ts", "quote_id").repartition(4)

    val plain = AsOfJoin.asof(left, right, "user", "q_user",
        "trade_ts", "q_ts", rightTieBreak = Seq("quote_id"))
      .select("trade_id", "quote_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    val salted = AsOfJoin.asofSalted(left, right, "user", "q_user",
      "trade_ts", "q_ts", rightTieBreak = Seq("quote_id"), slices = 8)
    val saltedMap = salted.select("trade_id", "quote_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(saltedMap === plain, "time-salting must not change any match")

    // the skew fix itself: the hot user's rows must come out of MORE than
    // one task (plain asof pins each key to exactly one partition)
    val hotParts = salted.filter(col("user") === 0L)
      .select(spark_partition_id().as("pid"))
      .distinct().count()
    assert(hotParts > 1L,
      s"hot key still on $hotParts partition(s) — salting had no effect")
  }

  test("matches the window-based q11 formulation on fixture events") {
    val dir = "/root/testdata/sf0.001"
    val ev = Tables.loadEvents(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("c_event_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"), col("value").as("c_value"))

    val native = AsOfJoin.asof(purchases, clicks,
        "user_id", "c_user", "ts", "c_ts", rightTieBreak = Seq("c_event_id"))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("c_ts").as("click_ts"), col("c_value").as("click_value"))
      .orderBy("event_id")
    val windowed = graft.operators.JoinQueries
      .queries("q11_join_asof")(spark, dir)

    val a = native.collect().map(_.toSeq).toSeq
    val b = windowed.collect().map(_.toSeq).toSeq
    assert(a.size === b.size)
    assert(a === b)
  }
}
