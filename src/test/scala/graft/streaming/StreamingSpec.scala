package graft.streaming

import java.sql.Timestamp
import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.streaming.StreamPipelines.UserEvent

/** True incremental Structured Streaming semantics that the DuckDB oracle
  * cannot replay (SURVEY.md §5 layer 2): watermark late-drop, session
  * merge, dedup-within-watermark, custom state, file-source round-trip. */
class StreamingSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("tumbling window + watermark: aggregates emit and late data is dropped") {
    val sess = spark
    import sess.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val df = input.toDF().toDF("ts", "event_type", "value")
    val q = StreamPipelines.windowedCounts(df)
      .writeStream.format("memory").queryName("tumble_t")
      .outputMode("append").start()
    try {
      input.addData(
        (ts("2024-01-01 00:05:00"), "click", 1.5),
        (ts("2024-01-01 00:20:00"), "click", 2.5),
        (ts("2024-01-01 01:10:00"), "view", 3.0))
      q.processAllAvailable()
      // watermark = 01:10 - 1h = 00:10 → window [00:00,01:00) still open
      assert(spark.sql("SELECT * FROM tumble_t").count() === 0)

      // advance watermark past both window ends
      input.addData((ts("2024-01-01 03:30:00"), "view", 1.0))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 03:31:00"), "view", 1.0))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT win_start, event_type, cnt, CAST(sum_value AS DOUBLE) FROM tumble_t ORDER BY win_start")
        .collect().map(r => (r.getTimestamp(0).toString, r.getString(1),
          r.getLong(2), r.getDouble(3)))
      assert(rows.contains(("2024-01-01 00:00:00.0", "click", 2L, 4.0)))
      assert(rows.contains(("2024-01-01 01:00:00.0", "view", 1L, 3.0)))

      // late event far behind the watermark → dropped, no new emission
      val before = spark.sql("SELECT count(*) FROM tumble_t").head().getLong(0)
      input.addData((ts("2024-01-01 00:07:00"), "click", 99.0))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 06:00:00"), "flush", 0.0))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 06:01:00"), "flush", 0.0))
      q.processAllAvailable()
      val after = spark.sql(
        "SELECT count(*) FROM tumble_t WHERE win_start = TIMESTAMP '2024-01-01 00:00:00'")
        .head().getLong(0)
      assert(after === 1, "late click must not re-emit or amend window 0")
      assert(spark.sql(
        "SELECT cnt FROM tumble_t WHERE win_start = TIMESTAMP '2024-01-01 00:00:00'")
        .head().getLong(0) === 2)
      assert(before >= 2)
    } finally q.stop()
  }

  test("q150: streamed interval attribution equals the one-shot q149 answer row-for-row") {
    // the oracle proves it against DuckDB; this proves it engine-side,
    // so a drift points at the streaming path alone (the q138 pattern)
    val dir = "/root/testdata/sf0.001"
    def rows(key: String) =
      graft.operators.JoinQueries.queries(key)(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSeq.sorted
    val streamed = rows("q150_stream_interval_join")
    assert(streamed === rows("q149_join_interval_binned"))
    assert(streamed.exists(_._2 > 0L),
      "fixture windows must attribute at least one event")
  }

  test("q145: the dual-sink router is a lossless DISJOINT PARTITION of the input") {
    // the oracle proves the aggregate checksums; this pins the row-level
    // law the checksums stand for: every doc_id lands in EXACTLY one sink
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.001"
    graft.operators.TextQueries.queries("q145_stream_quarantine")(
      spark, dir).collect()
    val base = System.getProperty("java.io.tmpdir") + "/graft_q145_" +
      graft.sources.Staging.sessionSuffix(spark, dir)
    val sch = "doc_id BIGINT, lang STRING, source STRING, " +
      "n_chars BIGINT, text STRING, quality DOUBLE"
    def ids(sink: String): Seq[Long] =
      graft.sources.Staging.readBatchSink(spark, s"$base/$sink", sch)
        .select(col("doc_id")).collect().map(_.getLong(0)).toSeq
    val pass = ids("pass")
    val quar = ids("quarantine")
    val all = graft.Tables.t(spark, dir, "documents")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSeq
    assert(pass.nonEmpty && quar.nonEmpty,
      "the 0.5 cut must route docs BOTH ways on the fixture corpus")
    assert(pass.toSet.intersect(quar.toSet).isEmpty,
      "no doc may land in both sinks")
    assert((pass ++ quar).sorted === all.sorted,
      "the sinks must reassemble the input exactly")
  }

  test("q135 micro-batch plan: stateless sign-LSH coding, no state store, no stream-side shuffle") {
    // the q135 serving shape: per-row coding is a narrow map (no
    // aggregation), the band join is stream-static — so the micro-batch
    // plan must carry NO StateStore and no hashpartitioning exchange on
    // the stream side (at fixture scale the static corpus broadcasts;
    // at 100 TB the bucketed corpus layout makes the fallback an SMJ
    // exchanging only the stream batch — either way the stream rows
    // never wide-shuffle before the join)
    import org.apache.spark.sql.functions.col
    val sess = spark
    import sess.implicits._
    implicit val ctx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val (tab, idxBits) =
      graft.operators.CorpusQueries.embedBandIndexFrozen(spark, dir)
    val corpus = spark.table(tab).toDF("corpus_vec", "e_c", "n_c", "bk")
    val input = MemoryStream[(Long, Array[Float])]
    val stream = input.toDF().toDF("vec_id", "embedding")
    val batch = graft.operators.CorpusQueries.codedBands(stream, idxBits)
      .toDF("batch_vec", "e_b", "n_b", "bk_b")
    val pairs = batch.join(corpus, expr("bk = bk_b"))
      .select(col("batch_vec"), col("corpus_vec"),
        graft.functions.VectorOps.cosinePre(
          graft.operators.LlmQueries.seqDot(col("e_b"), col("e_c")),
          col("n_b"), col("n_c")).as("sim"))
      .filter(col("sim") >= 0.4)
    val q = pairs.writeStream.format("memory").queryName("q135_t")
      .outputMode("append").start()
    try {
      // the FULL q109 ingest batch (not a sample): the sf0.001 gate
      // proves this batch has near-dup pairs against the index, so the
      // found-rows assertion below cannot be vacuous
      val vecs = graft.Tables.t(spark, dir, "embeddings")
        .filter(col("vec_id") % 10 === 7)
        .select("vec_id", "embedding")
        .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      input.addData(vecs.toIndexedSeq: _*)
      q.processAllAvailable()
      val plan = q.asInstanceOf[
          org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
        .streamingQuery.lastExecution.executedPlan.toString
      assert(!plan.contains("StateStore"),
        s"stateless stream-static pipeline must not plan state stores:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"stream rows must reach the band join without a wide shuffle:\n$plan")
      // and the pipeline actually found the known near-dups (q109's
      // gated sf0.001 answer is non-empty on this exact batch/index
      // split, so zero rows here means the join or coding broke)
      assert(spark.sql("SELECT count(*) FROM q135_t").head().getLong(0) > 0,
        "stream probe must surface the batch-vs-corpus near-dup pairs")
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark keeps first (user_id, event_type)") {
    val sess = spark
    import sess.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val df = input.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = StreamPipelines.dedupWithinWatermark(df)
      .writeStream.format("memory").queryName("dedup_t")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, ts("2024-01-01 00:00:10"), 7L, "click", 1.0),
        (2L, ts("2024-01-01 00:00:20"), 7L, "click", 2.0), // dup key, dropped
        (3L, ts("2024-01-01 00:00:30"), 7L, "view", 3.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT event_id FROM dedup_t ORDER BY event_id")
        .collect().map(_.getLong(0)).toSeq
      assert(rows === Seq(1L, 3L))
    } finally q.stop()
  }

  test("session windows merge within gap and split across it") {
    val sess = spark
    import sess.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val df = input.toDF().toDF("ts", "user_id")
    val q = StreamPipelines.sessionCounts(df)
      .writeStream.format("memory").queryName("sess_t")
      .outputMode("append").start()
    try {
      input.addData(
        (ts("2024-01-01 00:00:00"), 1L),
        (ts("2024-01-01 00:10:00"), 1L),
        (ts("2024-01-01 00:20:00"), 1L), // one session: [00:00, 00:50)
        (ts("2024-01-01 00:00:00"), 2L),
        (ts("2024-01-01 00:40:00"), 2L)) // two sessions (gap 40min ≥ 30)
      q.processAllAvailable()
      // flush: advance watermark far past all session ends
      input.addData((ts("2024-01-01 09:00:00"), 99L))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 09:01:00"), 99L))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT user_id, sess_start, sess_end, cnt FROM sess_t WHERE user_id IN (1,2) ORDER BY user_id, sess_start")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString,
          r.getTimestamp(2).toString, r.getLong(3)))
      assert(rows === Seq(
        (1L, "2024-01-01 00:00:00.0", "2024-01-01 00:50:00.0", 3L),
        (2L, "2024-01-01 00:00:00.0", "2024-01-01 00:30:00.0", 1L),
        (2L, "2024-01-01 00:40:00.0", "2024-01-01 01:10:00.0", 1L)))
    } finally q.stop()
  }

  test("tumbling window accumulates ACROSS micro-batches") {
    // q84's gated replay uses a single data batch + sentinel; this test
    // carries the multi-data-batch evidence: one window receives rows
    // from two separate micro-batches and must report their combined agg
    val sess = spark
    import sess.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val df = input.toDF().toDF("ts", "event_type", "value")
    val q = StreamPipelines.windowedCounts(df)
      .writeStream.format("memory").queryName("tumble_xb_t")
      .outputMode("append").start()
    try {
      input.addData((ts("2024-01-01 00:05:00"), "click", 1.0))
      q.processAllAvailable() // batch 1: window [00:00,01:00) cnt=1
      input.addData((ts("2024-01-01 00:50:00"), "click", 2.0))
      q.processAllAvailable() // batch 2: same window, state must update
      input.addData((ts("2024-01-01 05:00:00"), "view", 0.0))
      q.processAllAvailable() // advance watermark → flush the window
      val r = spark.sql(
        """SELECT cnt, sum_value FROM tumble_xb_t
          |WHERE win_start = TIMESTAMP '2024-01-01 00:00:00'""".stripMargin)
        .collect()
      assert(r.length === 1)
      assert(r(0).getLong(0) === 2L)
      assert(r(0).getDecimal(1).doubleValue() === 3.0)
    } finally q.stop()
  }

  test("session state merges ACROSS micro-batches") {
    // the gated q85 replay uses a single data batch + sentinel, so this
    // test carries the cross-batch evidence: one user's session arrives
    // split over two addData batches (separate micro-batches, separate
    // state-store commits) and must still merge into ONE session
    val sess = spark
    import sess.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val df = input.toDF().toDF("ts", "user_id")
    val q = StreamPipelines.sessionCounts(df)
      .writeStream.format("memory").queryName("sess_xb_t")
      .outputMode("append").start()
    try {
      input.addData(
        (ts("2024-01-01 00:00:00"), 1L),
        (ts("2024-01-01 00:10:00"), 1L))
      q.processAllAvailable() // batch 1: open session [00:00, 00:40)
      input.addData(
        (ts("2024-01-01 00:25:00"), 1L)) // within gap → must MERGE
      q.processAllAvailable()
      // flush: advance watermark far past the session end
      input.addData((ts("2024-01-01 09:00:00"), 99L))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 09:01:00"), 99L))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT user_id, sess_start, sess_end, cnt FROM sess_xb_t WHERE user_id = 1 ORDER BY sess_start")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString,
          r.getTimestamp(2).toString, r.getLong(3)))
      assert(rows === Seq(
        (1L, "2024-01-01 00:00:00.0", "2024-01-01 00:55:00.0", 3L)))
    } finally q.stop()
  }

  test("mapGroupsWithState accumulates running per-user totals") {
    val sess = spark
    import sess.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[UserEvent]
    val q = StreamPipelines.runningUserTotals(input.toDS())
      .writeStream.format("memory").queryName("totals_t")
      .outputMode("update").start()
    try {
      input.addData(UserEvent(1L, 2.0), UserEvent(1L, 3.0), UserEvent(2L, 1.0))
      q.processAllAvailable()
      input.addData(UserEvent(1L, 5.0))
      q.processAllAvailable()
      // memory sink in update mode appends each update; take the latest row
      val latest = spark.sql(
        """SELECT user_id, n, total FROM (
          |  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY n DESC) rn
          |  FROM totals_t) WHERE rn = 1 ORDER BY user_id""".stripMargin)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(latest === Seq((1L, 3L, 10.0), (2L, 1L, 1.0)))
    } finally q.stop()
  }

  test("flatMapGroupsWithState emits only on threshold crossings") {
    val sess = spark
    import sess.implicits._
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val input = MemoryStream[(Long, Double)]
    // alert once per user each time the running total crosses a 10-multiple
    val alerts = input.toDS()
      .groupByKey(_._1)
      .flatMapGroupsWithState[Double, (Long, Double)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, Double)], state: GroupState[Double]) =>
          var total = state.getOption.getOrElse(0.0)
          val out = Seq.newBuilder[(Long, Double)]
          rows.foreach { case (_, v) =>
            val prev = total
            total += v
            if ((total / 10).toInt > (prev / 10).toInt) out += ((uid, total))
          }
          state.update(total)
          out.result().iterator
      }.toDF("user_id", "total_at_alert")
    val q = alerts.writeStream.format("memory").queryName("alerts_t")
      .outputMode("append").start()
    try {
      input.addData((1L, 6.0), (1L, 3.0))   // total 9 → no alert
      q.processAllAvailable()
      input.addData((1L, 2.0), (2L, 12.0))  // 11 → alert; 12 → alert
      q.processAllAvailable()
      val rows = spark.sql("SELECT user_id, total_at_alert FROM alerts_t ORDER BY user_id")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(rows === Seq((1L, 11.0), (2L, 12.0)))
    } finally q.stop()
  }

  test("stream-stream interval join: clicks attribute to impressions") {
    val sess = spark
    import sess.implicits._
    implicit val ctx = spark.sqlContext
    val impressions = MemoryStream[(Long, Timestamp)]
    val clicks = MemoryStream[(Long, Timestamp)]
    val imp = impressions.toDF().toDF("imp_id", "imp_ts")
      .withWatermark("imp_ts", "10 minutes")
    val clk = clicks.toDF().toDF("click_imp_id", "click_ts")
      .withWatermark("click_ts", "10 minutes")
    val joined = imp.join(clk, expr(
      """imp_id = click_imp_id AND
        |click_ts >= imp_ts AND
        |click_ts <= imp_ts + interval 5 minutes""".stripMargin))
    val q = joined.writeStream.format("memory").queryName("attrib_t")
      .outputMode("append").start()
    try {
      impressions.addData((1L, ts("2024-01-01 00:00:00")),
        (2L, ts("2024-01-01 00:01:00")))
      clicks.addData(
        (1L, ts("2024-01-01 00:03:00")),  // within 5 min → joins
        (2L, ts("2024-01-01 00:30:00")))  // 29 min later → outside window
      q.processAllAvailable()
      val rows = spark.sql("SELECT imp_id FROM attrib_t")
        .collect().map(_.getLong(0)).toSeq
      assert(rows === Seq(1L), "only the in-window click must join")
    } finally q.stop()
  }

  test("foreachBatch lands deduped micro-batches in the staging layer") {
    val sess = spark
    import sess.implicits._
    implicit val ctx = spark.sqlContext
    val outDir = Files.createTempDirectory("graft_febatch").toString + "/stage"
    val input = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val df = input.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = StreamPipelines.dedupWithinWatermark(df)
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        if (!batch.isEmpty) {
          graft.sources.Staging.store(batch, s"$outDir/batch_$id")
          ()
        }
      }
      .start()
    try {
      input.addData(
        (1L, ts("2024-01-01 00:00:10"), 7L, "click", 1.0),
        (2L, ts("2024-01-01 00:00:20"), 7L, "click", 2.0)) // dup, dropped
      q.processAllAvailable()
      input.addData((3L, ts("2024-01-01 00:00:30"), 8L, "view", 3.0))
      q.processAllAvailable()
      val staged = spark.read.parquet(s"$outDir/batch_*")
      assert(staged.select("event_id").collect().map(_.getLong(0)).sorted
        === Array(1L, 3L))
    } finally q.stop()
  }

  test("upsertLoadStream converges the serving table to one row per key") {
    val sess = spark
    import sess.implicits._
    implicit val ctx = spark.sqlContext
    val base = Files.createTempDirectory("graft_upsert_load").toString
    val tableDir = s"$base/serving"
    val input = MemoryStream[(Long, Long, Double)]
    val df = input.toDF().toDF("id", "ver", "amount")
    val q = StreamPipelines.upsertLoadStream(
      df, Seq("id"), "ver", tableDir, s"$base/ckpt")
    try {
      // batch 1: two keys, key 1 updated twice WITHIN the batch
      input.addData((1L, 1L, 10.0), (2L, 1L, 20.0), (1L, 2L, 11.0))
      q.processAllAvailable()
      val after1 = StreamPipelines.readServingTable(spark, tableDir)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
        .toMap
      assert(after1 === Map(1L -> (2L, 11.0), 2L -> (1L, 20.0)),
        "last version per key within a batch must win")

      // batch 2: update key 2, insert key 3
      input.addData((2L, 2L, 21.0), (3L, 1L, 30.0))
      q.processAllAvailable()
      val after2 = StreamPipelines.readServingTable(spark, tableDir)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
        .toMap
      assert(after2 === Map(
        1L -> (2L, 11.0), 2L -> (2L, 21.0), 3L -> (1L, 30.0)))
      // crash-safety invariant: the previous committed version is still
      // present and complete (pointer flip is the only commit point)
      val vers = new java.io.File(tableDir).list().filter(_.matches("v\\d+"))
      assert(vers.length >= 1 && vers.contains(
        StreamPipelines.currentServingVersion(spark, tableDir).get))
    } finally q.stop()
  }

  test("file-source stream round-trip: readStream parquet -> parquet sink") {
    val sess = spark
    import sess.implicits._
    val inDir = Files.createTempDirectory("graft_stream_in").toString
    val outDir = Files.createTempDirectory("graft_stream_out").toString
    val ckpt = Files.createTempDirectory("graft_stream_ckpt").toString
    Seq(
      (1L, ts("2024-01-01 00:00:10"), 7L, "click", 1.0, """{"k": 1}"""),
      (2L, ts("2024-01-01 00:00:20"), 8L, "view", 2.0, """{"k": 2}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(inDir)
    val stream = StreamPipelines.readEventsStream(spark, inDir)
      .filter("value > 0")
    val q = stream.writeStream
      .format("parquet").option("path", outDir)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val out = spark.read.parquet(outDir)
    assert(out.count() === 2)
    assert(out.columns.toSet === StreamPipelines.eventSchema.fieldNames.toSet)
  }

  test("q190: admission decisions partition each batch exactly once") {
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.001"
    val out = graft.operators.CurationQueries
      .queries("q190_stream_admission")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val valid = Set("url_dup", "exact_dup", "near_dup", "low_quality", "admit")
    assert(out.map(_._2).toSet.subsetOf(valid))
    // each batch's decision counts and id mass partition its membership
    val docs = graft.Tables.t(spark, dir, "documents")
      .select(col("doc_id")).collect().map(_.getLong(0))
      .filter(_ % 10 == 7)
    for (pk <- Seq(7L, 17L)) {
      val member = docs.filter(_ % 20 == pk)
      val rows = out.filter(_._1 == pk)
      assert(rows.map(_._3).sum === member.length.toLong,
        s"batch $pk: decisions must cover every doc exactly once")
      assert(rows.map(_._4).sum === member.sum,
        s"batch $pk: id mass must be conserved across decisions")
    }
  }

  test("q174: streamed per-batch KS equals an exact driver-side recompute") {
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.001"
    val got = graft.operators.AuditQueries
      .queries("q174_stream_ks_drift")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val rows = graft.Tables.t(spark, dir, "documents")
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val corpus = rows.filter(_._1 % 10 != 7).map(_._2)
    val n2 = corpus.length.toLong
    val expect = Seq(7L, 17L).map { pk =>
      val b = rows.filter(_._1 % 20 == pk).map(_._2)
      val n1 = b.length.toLong
      val grid = (b ++ corpus).distinct.sorted
      val d = grid.map { v =>
        val c1 = b.count(_ <= v).toLong
        val c2 = corpus.count(_ <= v).toLong
        math.abs(c1 * n2 - c2 * n1)
      }.max
      pk -> (n1, d)
    }.toMap
    assert(got === expect,
      "each micro-batch's alarm row must equal the one-shot KS on its membership")
  }

  test("storeBatch sink is idempotent: a replayed micro-batch leaves " +
      "the read-back unchanged") {
    val sess = spark
    import sess.implicits._
    val dir = Files.createTempDirectory("graft_batch_sink").toString
    val b1 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val b2 = Seq((3L, "c")).toDF("id", "v")
    val schema = "id BIGINT, v STRING"
    graft.sources.Staging.storeBatch(b1, dir, 0L)
    graft.sources.Staging.storeBatch(b2, dir, 1L)
    def readBack() = graft.sources.Staging.readBatchSink(spark, dir, schema)
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    val once = readBack()
    assert(once === Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // the at-least-once case Structured Streaming actually produces: a
    // batch whose sink write may have partially landed runs AGAIN. With
    // SaveMode.Append the q138/q145/q174/q190 read-backs would now
    // double-count batch 0's rows; the overwrite-own-subdirectory
    // recipe must leave the read-back byte-identical instead.
    graft.sources.Staging.storeBatch(b1, dir, 0L)
    assert(readBack() === once,
      "a replayed batch must overwrite its own output, not append to it")
    // a sink no batch ever fed reads as EMPTY, not as a read error
    val never = Files.createTempDirectory("graft_batch_sink_e").toString +
      "/never_fed"
    assert(graft.sources.Staging.readBatchSink(spark, never, schema)
      .count() === 0L)
  }

  test("storeBatch collision guard: two DISTINCT micro-batches sharing a " +
      "content key fail loudly; a true replay still overwrites") {
    val sess = spark
    import sess.implicits._
    val dir = Files.createTempDirectory("graft_batch_guard").toString
    val b1 = Seq((1L, "a")).toDF("id", "v")
    val b1replay = Seq((1L, "a")).toDF("id", "v")
    val b2 = Seq((2L, "b")).toDF("id", "v")
    graft.sources.Staging.storeBatch(b1, dir, 7L, batchId = 0L)
    // the at-least-once replay: SAME framework batchId, same key — legal
    graft.sources.Staging.storeBatch(b1replay, dir, 7L, batchId = 0L)
    // a DIFFERENT batch landing on the same content key would silently
    // replace batch 0's rows under the r12 recipe — r13 fails instead
    val e = intercept[IllegalArgumentException] {
      graft.sources.Staging.storeBatch(b2, dir, 7L, batchId = 1L)
    }
    assert(e.getMessage.contains("collision"))
    // batch 0's rows survived the rejected write untouched
    val back = graft.sources.Staging
      .readBatchSink(spark, dir, "id BIGINT, v STRING")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(back === Seq((1L, "a")))
  }

  /** Stage one more single-file parquet batch into an existing stream
    * source directory — the "new data arrives while the query is DOWN"
    * step of the recovery laws (stageBatches' single-file recipe). */
  private def stageOne(base: String, src: String,
      df: org.apache.spark.sql.DataFrame, idx: Int): Unit = {
    import org.apache.hadoop.fs.Path
    val hfs = new Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmpDir = s"$base/tmpx$idx"
    df.coalesce(1).write.mode("overwrite").parquet(tmpDir)
    val f = hfs.listStatus(new Path(tmpDir)).map(_.getPath)
      .find(_.getName.endsWith(".parquet"))
      .getOrElse(throw new IllegalStateException(s"no part file in $tmpDir"))
    hfs.rename(f, new Path(src, s"batch$idx.parquet"))
    hfs.delete(new Path(tmpDir), true)
  }

  test("checkpoint recovery (q150 shape): a file-sink stream stopped " +
      "between batches resumes from its checkpoint and equals one-shot") {
    // the law r12 left open: batch-level replay idempotence was proven,
    // but not that a KILLED query restarted from its checkpoint picks
    // up exactly the unseen input. Phase 1 processes batch A and stops
    // (the kill); batch B arrives while nothing is running; phase 2
    // starts a NEW query over the same checkpoint + sink. The file
    // source's commit log must skip batch A (no reprocess — counted
    // WITHOUT distinct, so a re-emit fails) and the final sink must
    // equal the one-shot batch answer row-for-row.
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val s = spark
    val HourUs = graft.operators.JoinQueries.HourUs
    val ev = graft.Tables.loadEvents(s, dir)
      .select(col("event_id"), expr("unix_micros(ts)").as("us"),
        col("user_id"))
    val iv = ev.filter(col("event_id") % 199 === 0)
      .select(col("event_id").as("window_id"), col("us").as("s_us"),
        (col("us") + (col("event_id") % 7 + 1) * lit(HourUs)).as("e_us"))
    val base = graft.streaming.EventQueries.freshBase(s, dir, "q150ckpt")
    val outDir = s"$base/out"; val ckpt = s"$base/ckpt"
    val sinkSchema = "window_id BIGINT, event_id BIGINT, user_id BIGINT"
    val batchA = ev.filter(col("event_id") % 2 === 0)
    val batchB = ev.filter(col("event_id") % 2 === 1)
    val src = graft.streaming.EventQueries.stageBatches(s, base, Seq(batchA))
    def runOnce(): Unit = graft.Tables.withShufflePartitions(s, 4) {
      val stream = s.readStream
        .schema("event_id BIGINT, us BIGINT, user_id BIGINT")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
      val hits = graft.operators.JoinQueries
        .binnedIntervalHits(iv, stream, HourUs)
        .select(col("window_id"), col("event_id"), col("user_id"))
      val q = graft.streaming.StreamPipelines
        .writeParquetStream(hits, outDir, ckpt)
      try q.processAllAvailable() finally q.stop()
    }
    runOnce() // phase 1: batch A only, then the query dies
    val phase1 = s.read.schema(sinkSchema).parquet(outDir).count()
    stageOne(base, src, batchB, 1)
    runOnce() // phase 2: resumed from ckpt with B waiting
    val sink = s.read.schema(sinkSchema).parquet(outDir)
    val oneShot = graft.operators.JoinQueries
      .binnedIntervalHits(iv, ev, HourUs)
      .select(col("window_id"), col("event_id"), col("user_id"))
    assert(sink.count() === oneShot.count(),
      s"resume must process exactly the unseen batch: phase1=$phase1 " +
        s"sink=${sink.count()} oneShot=${oneShot.count()}")
    assert(sink.count() > phase1, "phase 2 must add batch B's rows")
    assert(sink.exceptAll(oneShot).isEmpty && oneShot.exceptAll(sink).isEmpty,
      "recovered stream must equal the one-shot batch answer row-for-row")
  }

  test("checkpoint recovery (q190 shape): a storeBatch foreachBatch sink " +
      "resumes without rewriting committed batches") {
    // same kill-restart protocol through the q138/q145/q174/q190 sink
    // recipe: phase 1 lands batch A under its content key (marker =
    // framework batchId 0) and the query stops; phase 2 restarts from
    // the checkpoint with batch B staged. The restart must process ONLY
    // B (A's sink subdirectory — marker file included — stays
    // byte-identical), and the read-back must equal the per-batch
    // driver recompute over both batches exactly once.
    import org.apache.spark.sql.functions._
    val s = spark
    val dir = "/root/testdata/sf0.001"
    val docs = graft.Tables.t(s, dir, "documents")
      .select(col("doc_id"), col("n_chars"))
    val base = graft.streaming.EventQueries.freshBase(s, dir, "q190ckpt")
    val outDir = s"$base/sink"; val ckpt = s"$base/ckpt"
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 === 1)
    val src = graft.streaming.EventQueries.stageBatches(s, base, Seq(a))
    def runOnce(): Unit = graft.Tables.withShufflePartitions(s, 4) {
      val stream = s.readStream.schema("doc_id BIGINT, n_chars BIGINT")
        .option("maxFilesPerTrigger", 1).parquet(src)
      val q = stream.writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
          if (!batch.isEmpty) {
            val key = batch.agg(min(pmod(col("doc_id"), lit(2L))))
              .head().getLong(0)
            graft.sources.Staging.storeBatch(
              batch.agg(count(lit(1)).as("n"),
                  sum("doc_id").cast("long").as("id_sum"),
                  sum("n_chars").cast("long").as("chars"))
                .select(lit(key).as("batch_key"), col("n"),
                  col("id_sum"), col("chars")),
              outDir, key, bid)
          }
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    runOnce() // phase 1: batch A committed, query killed
    import org.apache.hadoop.fs.Path
    val hfs = new Path(outDir)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val aDir = new Path(s"$outDir/batch-0")
    val aSnapshot = hfs.listStatus(aDir)
      .map(st => (st.getPath.getName, st.getLen, st.getModificationTime))
      .sortBy(_._1).toSeq
    stageOne(base, src, b, 1)
    runOnce() // phase 2: restart from ckpt
    assert(hfs.listStatus(aDir)
      .map(st => (st.getPath.getName, st.getLen, st.getModificationTime))
      .sortBy(_._1).toSeq === aSnapshot,
      "batch A's committed subdirectory must survive the restart untouched")
    val back = graft.sources.Staging.readBatchSink(s, outDir,
        "batch_key BIGINT, n BIGINT, id_sum BIGINT, chars BIGINT")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1).toSeq
    val expect = Seq(a, b).zipWithIndex.map { case (df, i) =>
      val r = df.agg(count(lit(1)), sum("doc_id"), sum("n_chars")).head()
      (i.toLong, r.getLong(0), r.getLong(1), r.getLong(2))
    }
    assert(back === expect,
      "read-back must hold both batches exactly once after recovery")
  }

  test("checkpoint recovery (q205 shape): the PSI stream killed between " +
      "batches restarts from its checkpoint and equals the one-shot run") {
    // the q190-law protocol applied to q205's content-keyed PSI sink:
    // phase 1 lands batch A's alarm row and the query stops; phase 2
    // restarts from the SAME checkpoint with batch B staged. The
    // restart must leave batch A's committed subdirectory (marker
    // included) byte-identical, and the recovered sink must equal a
    // ONE-SHOT run over both batches — the kill is invisible.
    import org.apache.spark.sql.functions._
    val s = spark
    val dir = "/root/testdata/sf0.001"
    val docs = graft.Tables.t(s, dir, "documents")
      .select(col("doc_id"), col("n_chars"))
      .filter(col("doc_id") % 10 === 7)
    val a = docs.filter(col("doc_id") % 20 === 7)
    val b = docs.filter(col("doc_id") % 20 === 17)
    val sinkSchema = "batch_key BIGINT, n_batch BIGINT, psi DOUBLE"
    def readBack(outDir: String): Seq[(Long, Long, Double)] =
      graft.sources.Staging.readBatchSink(s, outDir, sinkSchema)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(_._1).toSeq
    // recovered run: batch A, kill, stage B, restart from the checkpoint
    val base = graft.streaming.EventQueries.freshBase(s, dir, "q205ckpt")
    val outDir = s"$base/sink"; val ckpt = s"$base/ckpt"
    val src = graft.streaming.EventQueries.stageBatches(s, base, Seq(a))
    graft.operators.AuditQueries.psiStream(s, dir, src, outDir, ckpt)
    import org.apache.hadoop.fs.Path
    val hfs = new Path(outDir)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val aDir = new Path(s"$outDir/batch-7")
    val aSnapshot = hfs.listStatus(aDir)
      .map(st => (st.getPath.getName, st.getLen, st.getModificationTime))
      .sortBy(_._1).toSeq
    stageOne(base, src, b, 1)
    graft.operators.AuditQueries.psiStream(s, dir, src, outDir, ckpt)
    assert(hfs.listStatus(aDir)
      .map(st => (st.getPath.getName, st.getLen, st.getModificationTime))
      .sortBy(_._1).toSeq === aSnapshot,
      "batch A's committed PSI row must survive the restart untouched")
    // one-shot twin: both batches staged, fresh checkpoint and sink
    val base2 = graft.streaming.EventQueries.freshBase(s, dir, "q205once")
    val src2 = graft.streaming.EventQueries.stageBatches(s, base2, Seq(a, b))
    val out2 = s"$base2/sink"
    graft.operators.AuditQueries.psiStream(s, dir, src2, out2, s"$base2/ckpt")
    val recovered = readBack(outDir)
    assert(recovered.map(_._1) === Seq(7L, 17L),
      "both content keys must be present exactly once after recovery")
    assert(recovered === readBack(out2),
      "the kill-restart run must equal the one-shot run row-for-row")
  }

  test("q207 law: every retained serving version is the exact batch-prefix " +
      "merge, and a vacuumed version read is loud") {
    // drive q207's upsert pipeline (event_id % 3 batches, all versions
    // retained) at sf0.001, then check the TIME-TRAVEL contract: each
    // v<k> equals the driver-side merge of batches 0..k (later batch
    // wins per user, ts DESC / event_id tie-break within a batch), and
    // reading a version that was never committed fails loudly instead
    // of silently un-pinning to _CURRENT.
    import org.apache.spark.sql.functions._
    import graft.streaming.{EventQueries, StreamPipelines}
    val s = spark
    val dir = "/root/testdata/sf0.001"
    val ev = graft.Tables.loadEvents(s, dir)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    val base = EventQueries.freshBase(s, dir, "q207law")
    val tableDir = s"$base/serve"
    val src = EventQueries.stageBatches(s, base,
      (0 until 3).map(i => ev.filter(pmod(col("event_id"), lit(3)) === i)))
    graft.Tables.withShufflePartitions(s, 4) {
      val stream = StreamPipelines.readEventsStream(s, src,
        maxFilesPerTrigger = Some(1))
      val q = StreamPipelines.upsertLoadStream(
        stream, Seq("user_id"), "ts", tableDir, s"$base/ckpt",
        retainVersions = Int.MaxValue)
      try q.processAllAvailable() finally q.stop()
    }
    val rows = ev.select(col("event_id"), unix_micros(col("ts")).as("us"),
        col("user_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    for (k <- 0 to 2) {
      val got = StreamPipelines.readServingTableAt(s, tableDir, s"v$k")
        .select("user_id", "event_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
      val expect = rows.filter(_._1 % 3 <= k)
        .groupBy(_._3).map { case (uid, g) =>
          // later batch wins; within a batch ts DESC then event_id ASC
          val best = g.minBy(t => (-(t._1 % 3), -t._2, t._1))
          (uid, best._1)
        }.toSeq.sortBy(_._1)
      assert(got === expect, s"v$k must be the exact merge of batches 0..$k")
    }
    // version pinning must be loud, never a silent _CURRENT fallback
    intercept[java.util.NoSuchElementException] {
      StreamPipelines.readServingTableAt(s, tableDir, "v99")
    }
  }

  test("vacuum law (q207 horizon): retainVersions keeps exactly the newest " +
      "N versions, vacuumed reads are loud, and a mid-flip kill stays readable") {
    // VERDICT r15 item 3: the retention pass existed but no law pinned
    // it. Run the q207 batch shape with retainVersions=2, then check
    // the full horizon contract on the resulting table.
    import org.apache.spark.sql.functions._
    import org.apache.hadoop.fs.Path
    import graft.streaming.{EventQueries, StreamPipelines}
    val s = spark
    val dir = "/root/testdata/sf0.001"
    val ev = graft.Tables.loadEvents(s, dir)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    val base = EventQueries.freshBase(s, dir, "q207vac")
    val tableDir = s"$base/serve"
    val src = EventQueries.stageBatches(s, base,
      (0 until 3).map(i => ev.filter(pmod(col("event_id"), lit(3)) === i)))
    graft.Tables.withShufflePartitions(s, 4) {
      val stream = StreamPipelines.readEventsStream(s, src,
        maxFilesPerTrigger = Some(1))
      val q = StreamPipelines.upsertLoadStream(
        stream, Seq("user_id"), "ts", tableDir, s"$base/ckpt",
        retainVersions = 2)
      try q.processAllAvailable() finally q.stop()
    }
    val hfs = new Path(tableDir)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    def versionDirs: Seq[String] = hfs.listStatus(new Path(tableDir))
      .map(_.getPath.getName).filter(_.matches("v\\d+")).sorted.toSeq
    // 1. exactly the newest 2 of the 3 committed versions survive
    assert(versionDirs === Seq("v1", "v2"),
      "retainVersions=2 must keep exactly the newest two version dirs")
    // 2. _CURRENT still resolves to the committed head
    assert(StreamPipelines.currentServingVersion(s, tableDir)
      === Some("v2"), "_CURRENT must resolve after the retention pass")
    val v2Rows = StreamPipelines.readServingTable(s, tableDir).count()
    assert(v2Rows > 0, "the live version must be readable")
    // 3. the vacuumed version read throws and NAMES the retained set
    val ex = intercept[java.util.NoSuchElementException] {
      StreamPipelines.readServingTableAt(s, tableDir, "v0")
    }
    assert(ex.getMessage.contains("v1,v2"),
      s"the error must name the retained versions: ${ex.getMessage}")
    // 4a. kill between version-write and pointer flip: the new v3 dir
    // exists but _CURRENT still points at v2 — readers must stay on
    // the pointed (previous) version, fully readable
    StreamPipelines.readServingTable(s, tableDir)
      .write.mode("overwrite").parquet(s"$tableDir/v3")
    assert(StreamPipelines.currentServingVersion(s, tableDir)
      === Some("v2"),
      "an uncommitted higher version must not capture readers")
    assert(StreamPipelines.readServingTable(s, tableDir).count() === v2Rows)
    // 4b. kill mid-flip proper (pointer deleted, rename never ran):
    // readers fall back to the highest complete version and stay
    // readable — the documented fallback path
    hfs.delete(new Path(tableDir, "_CURRENT"), false)
    assert(StreamPipelines.currentServingVersion(s, tableDir)
      === Some("v3"),
      "with the pointer lost, the highest complete version serves")
    assert(StreamPipelines.readServingTable(s, tableDir).count() === v2Rows,
      "the fallback version must be a complete, readable snapshot")
  }
}
