package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** Streaming semantics, batch-equivalent + oracle-checkable
  * (SURVEY.md §2b q39–q42). The same `window`/`session_window` expressions
  * run incrementally under Structured Streaming in
  * [[graft.streaming.StreamPipelines]]; here they run in batch mode so
  * DuckDB can replay them (time_bucket / gaps-and-islands twins). */
object EventQueries {

  /** Per-(sf, session) working area under java.io.tmpdir, stale
    * sessions reaped by age, always rebuilt from scratch: a
    * skip-if-exists guard would both accept a partially-written area
    * after a crash (silent wrong answer) and let benchmark re-runs
    * measure only the read-back. */
  private[graft] def freshBase(s: SparkSession, dir: String, tag: String): String = {
    val tmp = System.getProperty("java.io.tmpdir")
    graft.sources.Staging.vacuumStale(s, tmp, s"graft_${tag}_")
    val base = s"$tmp/graft_${tag}_" +
      graft.sources.Staging.sessionSuffix(s, dir)
    graft.sources.Staging.vacuum(s, base)
    base
  }

  /** Stage each part as ONE parquet file under `base`/src with
    * explicitly increasing modification times: the file source replays
    * the initial listing oldest-first, so with maxFilesPerTrigger=1
    * this is a deterministic micro-batch replay of `parts` in order.
    *
    * The per-part single-file writes are INDEPENDENT Spark jobs (each
    * writes its own tmp dir), so they are submitted concurrently from a
    * small driver thread pool (guide §2.6 — overlap independent jobs so
    * the next part's tasks back-fill the slots the previous part's tail
    * leaves idle; each part is a coalesce(1) write whose single task
    * would otherwise serialize the whole staging step). File CONTENTS
    * and the mtime ordering are unchanged: batch order is fixed by the
    * explicit per-index setTimes below, not by write completion order. */
  private[graft] def stageBatches(s: SparkSession, base: String,
      parts: Seq[DataFrame]): String = {
    import org.apache.hadoop.fs.Path
    val src = s"$base/src"
    val hfs = new Path(base).getFileSystem(s.sparkContext.hadoopConfiguration)
    hfs.mkdirs(new Path(src))
    val now = System.currentTimeMillis()
    val n = parts.size
    graft.Par.run(4)(parts.zipWithIndex.map { case (part, i) =>
      () => part.coalesce(1).write.mode("overwrite").parquet(s"$base/tmp$i")
    })
    // sequential driver-side publish: rename each part's single file into
    // place and stamp its deterministic mtime (ordering source of truth)
    (0 until n).foreach { i =>
      val tmpDir = s"$base/tmp$i"
      val f = hfs.listStatus(new Path(tmpDir)).map(_.getPath)
        .find(_.getName.endsWith(".parquet"))
        .getOrElse(throw new IllegalStateException(s"no part file in $tmpDir"))
      val dst = new Path(src, s"batch$i.parquet")
      hfs.rename(f, dst)
      hfs.setTimes(dst, now - (n - i).toLong * 60000L, -1)
      hfs.delete(new Path(tmpDir), true)
    }
    src
  }

  /** Split events into `n` contiguous ts ranges on VALUE boundaries
    * (never row counts), so rows with equal ts always land in one
    * batch; cutoff precision is irrelevant to correctness — only the
    * range ordering matters. Also returns the corpus max ts (micros),
    * computed in the same single action, for sentinel construction. */
  private def tsRangeSplitWithMax(ev: DataFrame, n: Int): (Seq[DataFrame], Long) = {
    if (n == 1) {
      // degenerate split: the whole corpus as one batch (the caller still
      // appends a sentinel batch after it) — only the max ts is needed
      val maxTs = ev.select(max(unix_micros(col("ts")))).head().getLong(0)
      return (Seq(ev), maxTs)
    }
    val probs = (1 until n).map(i => i.toDouble / n)
    val row = ev.select(
        expr(s"percentile(unix_micros(ts), array(${probs.mkString(",")}))"),
        max(unix_micros(col("ts"))))
      .head()
    val cuts = row.getSeq[Double](0)
    val micros = expr("unix_micros(ts)")
    val parts = (0 until n).map { i =>
      val lo = if (i == 0) lit(true) else micros > cuts(i - 1)
      val hi = if (i == n - 1) lit(true) else micros <= cuts(i)
      ev.filter(lo && hi)
    }
    (parts, row.getLong(1))
  }

  private[graft] def tsRangeSplit(ev: DataFrame, n: Int): Seq[DataFrame] =
    tsRangeSplitWithMax(ev, n)._1

  /** Run `body` with shuffle partitions dialed down to 8 (shared
    * [[graft.Tables.withShufflePartitions]] discipline). The streaming
    * keys pay (shuffle partitions) × (micro-batches) state-store tasks
    * per run — at 32 partitions that fixed overhead dominated their
    * bench cost (q86 was 22 s at toy scale). 8 keeps the plan shape
    * identical (the checkpoint is fresh each run, so the state store is
    * born at 8) and the oracle gate proves results unchanged. Only the
    * streaming work happens inside `body`; a returned DataFrame's final
    * read-back sort evaluates later under the restored setting. */
  private def withFewShufflePartitions[A](s: SparkSession)(body: => A): A =
    graft.Tables.withShufflePartitions(s, 8)(body)

  /** One event `hours` past `maxTs`: advances the global watermark far
    * enough to close every REAL window/session, so an append-mode sink
    * flushes them (via the no-data micro-batch); the sentinel's own
    * group never closes and is filtered from results. */
  private def sentinelEvent(ev: DataFrame, maxTs: Long, hours: Int): DataFrame =
    ev.limit(1).select(
      lit(-1L).as("event_id"),
      timestamp_micros(lit(maxTs + hours.toLong * 3600 * 1000 * 1000))
        .as("ts"),
      lit(-1L).as("user_id"), lit("__sentinel").as("event_type"),
      lit(0.0).as("value"), lit(null).cast("string").as("props"))

  /** q207/q213's SHARED serving-table build: events split on event_id
    * % 3 (the same user recurs across batches with interleaved
    * timestamps — see the q207 key note), run through the real
    * [[StreamPipelines.upsertLoadStream]] with every version retained.
    *
    * Built ONCE per (session, sf) and REUSED by both consumers — the
    * q106/q57 build-once discipline applied to the versioned serving
    * table (r21: the two keys each paid an identical full build+stream,
    * the one place the inventory still rebuilt a shared artifact per
    * consumer). Bench times the build separately as q207_index_build
    * (rebuild = true), so the gated keys are probe-priced: q207 is the
    * pinned batch READ, q213 the pinned streamed read. The content is a
    * pure function of the input events, so reuse cannot change results
    * (both keys gate against the same oracle as before). A
    * `_GRAFT_SERVE_DONE` marker written only after the stream completes
    * guards the reuse: a crash mid-build leaves no marker and the next
    * caller rebuilds instead of serving a torn table (the
    * freshBase/always-rebuild concern, answered the corpusBandIndex
    * way). Returns the serving-table dir. */
  private[graft] def timeTravelServe(s: SparkSession, dir: String,
      rebuild: Boolean = false): String = {
    import org.apache.hadoop.fs.Path
    val tmp = System.getProperty("java.io.tmpdir")
    graft.sources.Staging.vacuumStale(s, tmp, "graft_ttserve_")
    val base = s"$tmp/graft_ttserve_" +
      graft.sources.Staging.sessionSuffix(s, dir)
    val tableDir = s"$base/serve"
    val done = new Path(base, "_GRAFT_SERVE_DONE")
    val hfs = done.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (rebuild || !hfs.exists(done)) {
      graft.sources.Staging.vacuum(s, base)
      val ckpt = s"$base/ckpt"
      val ev = loadEvents(s, dir)
      val src = stageBatches(s, base,
        (0 until 3).map(i => ev.filter(pmod(col("event_id"), lit(3)) === i)))
      withFewShufflePartitions(s) {
        val stream = StreamPipelines.readEventsStream(s, src,
          maxFilesPerTrigger = Some(1))
        val q = StreamPipelines.upsertLoadStream(
          stream, Seq("user_id"), "ts", tableDir, ckpt,
          retainVersions = Int.MaxValue)
        try q.processAllAvailable() finally q.stop()
      }
      hfs.create(done, true).close()
    }
    tableDir
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // 1-hour tumbling windows: epoch-aligned on both engines.
    "q39_tumble" -> { (s, dir) =>
      loadEvents(s, dir)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          sum(dec("value")).cast(D).cast("double").as("sum_value"))
        .select(
          col("window.start").as("win_start"),
          col("window.end").as("win_end"),
          col("event_type"), col("cnt"), col("sum_value"))
        .orderBy("win_start", "event_type")
    },

    // 1h windows sliding 30min — every event lands in exactly 2 windows.
    "q40_slide" -> { (s, dir) =>
      loadEvents(s, dir)
        .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .select(
          col("window.start").as("win_start"),
          col("window.end").as("win_end"),
          col("event_type"), col("cnt"))
        .orderBy("win_start", "event_type")
    },

    // 30-min-gap sessions per user. Spark session end = last ts + gap
    // (end-exclusive), so a gap of exactly 30min starts a NEW session —
    // the oracle's gaps-and-islands uses >= to match.
    "q41_session" -> { (s, dir) =>
      loadEvents(s, dir)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("cnt"))
        .select(
          col("session_window.start").as("sess_start"),
          col("session_window.end").as("sess_end"),
          col("user_id"), col("cnt"))
        .orderBy("user_id", "sess_start")
    },

    // Keep-earliest dedup per (user_id, event_type) — batch analog of
    // dropDuplicatesWithinWatermark with a deterministic keep rule.
    "q42_stream_dedup" -> { (s, dir) =>
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy("ts", "event_id")
      loadEvents(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("event_id", "user_id", "event_type", "ts", "value")
        .orderBy("user_id", "event_type")
    },

    // The TRUE streaming load path under the oracle gate: events split
    // into 3 time-ordered micro-batch files, run through the real
    // [[StreamPipelines.upsertLoadStream]] (foreachBatch key-merge with
    // versioned dirs + _CURRENT pointer), then the serving table read
    // back via [[StreamPipelines.readServingTable]]. Because batch i+1
    // holds strictly later timestamps than batch i (ts-value split —
    // equal timestamps never straddle a batch), "last batch wins" per
    // key equals "globally latest row per key", which DuckDB replays as
    // row_number() OVER (PARTITION BY user_id ORDER BY ts DESC,
    // event_id) = 1. This gates the reference's declared warehouse-load
    // stage (README.md:2) end-to-end the way q69/q75 gate staging.
    "q79_stream_upsert_load" -> { (s, dir) =>
      val base = freshBase(s, dir, "q79")
      val tableDir = s"$base/serve"
      val ckpt = s"$base/ckpt"
      val src = stageBatches(s, base, tsRangeSplit(loadEvents(s, dir), 3))
      withFewShufflePartitions(s) {
        val stream = StreamPipelines.readEventsStream(s, src,
          maxFilesPerTrigger = Some(1))
        val q = StreamPipelines.upsertLoadStream(
          stream, Seq("user_id"), "ts", tableDir, ckpt)
        try q.processAllAvailable() finally q.stop()
      }
      StreamPipelines.readServingTable(s, tableDir)
        .select("user_id", "event_id", "ts", "event_type", "value", "props")
        .orderBy("user_id")
    },

    // TIME-TRAVEL READ over the versioned serving table — q79's lake
    // path retains every `v<batchId>` snapshot (retainVersions high)
    // and the reader pins table@v1: exactly what a consumer at batch-1
    // time saw, long after batch 2 moved _CURRENT past it — the
    // reproducible-training-run primitive (pin the corpus version,
    // not "whatever is live"). The batches split on event_id % 3 (NOT
    // q79's ts ranges), so the same user recurs across batches with
    // interleaved timestamps — v1 must show batch-1 rows REPLACING
    // batch-0 rows for shared users even where batch 0 held the later
    // timestamp, which is upsert semantics proper, not global-latest.
    // Oracle: the batch prefix replayed as one window — batch index
    // DESC first (later batch wins), then the in-batch keep rule
    // (ts DESC, event_id). Scale: each snapshot is a complete merge,
    // so time-travel reads are plain pruned scans of one version dir —
    // no log replay, no delta reconstruction.
    "q207_time_travel" -> { (s, dir) =>
      val tableDir = timeTravelServe(s, dir)
      StreamPipelines.readServingTableAt(s, tableDir, "v1")
        .select("user_id", "event_id", "ts", "event_type", "value", "props")
        .orderBy("user_id")
    },

    // STREAMED read of the PINNED version — q207's serving twin (the
    // q138 discipline applied to time travel): the batch reader proved
    // table@v1 is the batch-1 snapshot; this key proves the SAME pin
    // holds for a STREAMING consumer. A readStream subscribes to the
    // v1 version directory (schema pinned from the loud batch
    // resolver, which throws if v1 were vacuumed) one file per
    // trigger, while _CURRENT already points past it at v2 — a
    // training-data loader tailing a pinned corpus snapshot, immune
    // to the table moving on. The stream is a stateless file-source
    // passthrough into the exactly-once parquet sink: version dirs
    // are immutable-once-committed (upsert rewrites only its OWN
    // v<batchId>), so subscription-at-rest is sound; retention is the
    // one hazard and the key retains all versions (the vacuum law in
    // StreamingSpec pins what happens when retention wins instead).
    // Oracle: q207's batch-prefix window VERBATIM — streamed-pinned ≡
    // batch-pinned ≡ driver-side prefix merge.
    "q213_stream_time_travel" -> { (s, dir) =>
      val tableDir = timeTravelServe(s, dir)
      // loud pin first: resolves v1 or throws naming the retained set
      val pinned = StreamPipelines.readServingTableAt(s, tableDir, "v1")
      // the key's OWN stream output lives under its own fresh base (not
      // the shared serve dir): a reused sink checkpoint would skip the
      // replay and measure only the read-back
      val own = freshBase(s, dir, "q213")
      val outDir = s"$own/stream_out"
      val ckpt2 = s"$own/stream_ckpt"
      withFewShufflePartitions(s) {
        val stream = s.readStream
          .schema(pinned.schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(s"$tableDir/v1")
        val q = StreamPipelines.writeParquetStream(stream, outDir, ckpt2)
        try q.processAllAvailable() finally q.stop()
      }
      s.read.parquet(outDir)
        .select("user_id", "event_id", "ts", "event_type", "value", "props")
        .orderBy("user_id")
    },

    // TRUE incremental windowed aggregation under the gate: the same
    // tumbling-window agg as q39, but executed by Structured Streaming
    // (watermark + append-mode parquet sink) over micro-batches instead
    // of one batch job. An append sink only emits a window once the
    // watermark passes its end, so the last batch is a single SENTINEL
    // event 3 hours past the corpus max — it closes every real window
    // (Spark's no-data micro-batch then flushes them) and its own
    // never-closed window is filtered out of the result. Oracle = q39's
    // batch twin: the incremental and batch runs must agree bit-for-bit.
    // Two micro-batches (data + sentinel): each state-store round costs
    // (shuffle partitions) tasks plus checkpoint I/O, so the gated key
    // runs the MINIMAL honest replay — all streaming machinery (state
    // store, watermark advance, append-mode flush via the no-data batch)
    // still executes; multi-data-batch window accumulation is pinned by
    // StreamingSpec's MemoryStream suites.
    "q84_stream_tumble" -> { (s, dir) =>
      val base = freshBase(s, dir, "q84")
      val outDir = s"$base/out"
      val ckpt = s"$base/ckpt"
      val ev = loadEvents(s, dir)
      val (parts, maxTs) = tsRangeSplitWithMax(ev, 1)
      val src = stageBatches(s, base, parts :+ sentinelEvent(ev, maxTs, 3))
      withFewShufflePartitions(s) {
        val agg = StreamPipelines.windowedCounts(
          StreamPipelines.readEventsStream(s, src, maxFilesPerTrigger = Some(1)))
        val q = StreamPipelines.writeParquetStream(agg, outDir, ckpt)
        try q.processAllAvailable() finally q.stop()
      }
      s.read.parquet(outDir)
        .filter(col("event_type") =!= "__sentinel")
        .select(col("win_start"), col("win_end"), col("event_type"),
          col("cnt"), col("sum_value").cast("double").as("sum_value"))
        .orderBy("win_start", "event_type")
    },

    // TRUE incremental SESSION windows under the gate — q41's semantics
    // executed by Structured Streaming with merging session state and a
    // watermark, flushed by the same sentinel trick as q84 (the global
    // watermark it advances closes every real user's sessions; the
    // sentinel user's own open session is filtered out). Oracle = q41's
    // gaps-and-islands twin: incremental session merging must agree
    // with the one-shot batch computation exactly. Two micro-batches
    // (data + sentinel) as in q84 — cross-batch SESSION MERGING
    // specifically is pinned by StreamingSpec, which feeds a user's
    // session in split batches through the same sessionCounts pipeline.
    "q85_stream_session" -> { (s, dir) =>
      val base = freshBase(s, dir, "q85")
      val outDir = s"$base/out"
      val ckpt = s"$base/ckpt"
      val ev = loadEvents(s, dir)
      val (parts, maxTs) = tsRangeSplitWithMax(ev, 1)
      val src = stageBatches(s, base, parts :+ sentinelEvent(ev, maxTs, 3))
      withFewShufflePartitions(s) {
        val agg = StreamPipelines.sessionCounts(
          StreamPipelines.readEventsStream(s, src, maxFilesPerTrigger = Some(1)))
        val q = StreamPipelines.writeParquetStream(agg, outDir, ckpt)
        try q.processAllAvailable() finally q.stop()
      }
      s.read.parquet(outDir)
        .filter(col("user_id") =!= -1L)
        .select("sess_start", "sess_end", "user_id", "cnt")
        .orderBy("user_id", "sess_start")
    },

    // TRUE stream-stream interval join under the gate: each purchase
    // matched to the same user's clicks in the preceding hour, both
    // sides incremental streams with watermark-bounded join state. An
    // inner stream-stream join emits a pair exactly once, when both
    // rows have arrived — no sentinel needed. No match can be lost to
    // state eviction: batches are ts-ordered, so when a purchase
    // arrives the watermark is ≥2 h behind it, and any click it can
    // match (≤1 h older) is still within its retention window. Oracle =
    // the equivalent one-shot interval join in DuckDB. TWO ts-ordered
    // batches: cross-batch matching — the property that makes the join
    // incremental — is still exercised (batch-2 purchases match batch-1
    // clicks held in join state), while each extra batch would only add
    // state-store rounds; join-state retention/eviction is also pinned
    // by StreamingSpec's interval-join suite.
    "q86_stream_join" -> { (s, dir) =>
      val base = freshBase(s, dir, "q86")
      val outDir = s"$base/out"
      val ckpt = s"$base/ckpt"
      val src = stageBatches(s, base, tsRangeSplit(loadEvents(s, dir), 2))
      withFewShufflePartitions(s) {
        def side(tpe: String, prefix: String) =
          StreamPipelines.readEventsStream(s, src, maxFilesPerTrigger = Some(1))
            .filter(col("event_type") === tpe)
            .select(col("event_id").as(s"${prefix}_id"),
              col("user_id").as(s"${prefix}_user"),
              col("ts").as(s"${prefix}_ts"))
            .withWatermark(s"${prefix}_ts", "2 hours")
        val joined = side("purchase", "p").join(side("click", "c"),
          col("p_user") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
          col("c_ts") <= col("p_ts"))
        val q = StreamPipelines.writeParquetStream(joined, outDir, ckpt)
        try q.processAllAvailable() finally q.stop()
      }
      s.read.parquet(outDir)
        .select("p_id", "p_user", "p_ts", "c_id", "c_ts")
        .orderBy("p_id", "c_id")
    },
  )

  // shared by q39 (batch) and q84 (incremental): the two keys are
  // REQUIRED to gate against the same oracle — one literal makes that
  // structural instead of copy-paste discipline
  private val tumbleSql =
    """WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events)
      |SELECT date_trunc('hour', ts) AS win_start,
      |  date_trunc('hour', ts) + INTERVAL '1 hour' AS win_end,
      |  event_type, count(*) AS cnt,
      |  CAST(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_value
      |FROM e GROUP BY 1, 2, 3
      |ORDER BY win_start, event_type""".stripMargin

  // shared by q41 (batch) and q85 (incremental), same reasoning
  private val sessionSql =
    """WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, user_id FROM events),
      | flagged AS (SELECT user_id, ts,
      |   CASE WHEN lag(ts) OVER w IS NULL
      |     OR ts - lag(ts) OVER w >= INTERVAL '30 minutes' THEN 1 ELSE 0 END AS new_sess
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      | sess AS (SELECT user_id, ts,
      |   sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM flagged)
      |SELECT min(ts) AS sess_start, max(ts) + INTERVAL '30 minutes' AS sess_end,
      |  user_id, count(*) AS cnt
      |FROM sess GROUP BY user_id, sid
      |ORDER BY user_id, sess_start""".stripMargin

  def oracle: Map[String, String] = Map(
    "q39_tumble" -> tumbleSql,

    "q40_slide" ->
      """WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
        | x AS (SELECT event_type,
        |   unnest([time_bucket(INTERVAL '30 minutes', ts),
        |           time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes']) AS win_start
        |  FROM e)
        |SELECT win_start, win_start + INTERVAL '1 hour' AS win_end,
        |  event_type, count(*) AS cnt
        |FROM x GROUP BY win_start, event_type
        |ORDER BY win_start, event_type""".stripMargin,

    "q41_session" -> sessionSql,

    "q42_stream_dedup" ->
      """WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value FROM events),
        | r AS (SELECT *, row_number() OVER
        |   (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn FROM e)
        |SELECT event_id, user_id, event_type, ts, value
        |FROM r WHERE rn = 1
        |ORDER BY user_id, event_type""".stripMargin,

    // the one-shot interval join the incremental execution must equal
    "q86_stream_join" ->
      """WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type FROM events)
        |SELECT p.event_id AS p_id, p.user_id AS p_user, p.ts AS p_ts,
        |  c.event_id AS c_id, c.ts AS c_ts
        |FROM e p JOIN e c
        |  ON p.event_type = 'purchase' AND c.event_type = 'click'
        | AND p.user_id = c.user_id
        | AND c.ts >= p.ts - INTERVAL '1 hour' AND c.ts <= p.ts
        |ORDER BY p_id, c_id""".stripMargin,

    // the incremental twins gate against the SAME literals as their
    // batch keys — structurally identical oracles by construction
    "q85_stream_session" -> sessionSql,
    "q84_stream_tumble" -> tumbleSql,

    // event_id is unique, so the keep-rule never needs the trailing
    // tie-break columns the stream-side dedup carries
    "q79_stream_upsert_load" ->
      """WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events),
        | r AS (SELECT *, row_number() OVER
        |   (PARTITION BY user_id ORDER BY ts DESC, event_id) AS rn FROM e)
        |SELECT user_id, event_id, ts, event_type, value, props
        |FROM r WHERE rn = 1
        |ORDER BY user_id""".stripMargin,

    // q207: the batch prefix up through v1 (event_id % 3 IN (0, 1)),
    // later batch winning per user, then the in-batch keep rule —
    // q79's window with the batch index prepended to the order
    "q207_time_travel" -> TimeTravelV1Sql,

    // q213 = q207's answer reached through a STREAMING read of the
    // pinned version; same SQL, and the gate becomes the
    // streamed-pinned ≡ batch-pinned proof (the q138 discipline)
    "q213_stream_time_travel" -> TimeTravelV1Sql,
  )

  /** q207/q213's shared DuckDB twin: the batch-0..1 prefix replayed as
    * one window — batch index DESC (later batch wins), then the
    * in-batch keep rule (ts DESC, event_id). */
  private val TimeTravelV1Sql: String =
    """WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props,
      |   event_id % 3 AS b FROM events WHERE event_id % 3 <= 1),
      | r AS (SELECT *, row_number() OVER
      |   (PARTITION BY user_id ORDER BY b DESC, ts DESC, event_id) AS rn FROM e)
      |SELECT user_id, event_id, ts, event_type, value, props
      |FROM r WHERE rn = 1
      |ORDER BY user_id""".stripMargin
}
