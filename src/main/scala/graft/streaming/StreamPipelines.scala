package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._
import graft.Tables._

/** Structured Streaming pipelines (SURVEY.md §2b "true incremental" row).
  *
  * The reference's closest analogue is S3-prefix polling
  * (`utils/utils/s3.py:16-23`); Spark-native that becomes a file-source
  * `readStream` with incremental micro-batches, watermark-bounded state,
  * and exactly-once file sinks. Every transform here is also valid on a
  * batch DataFrame of the same schema — the batch twins are the
  * oracle-checked q39–q42 keys in [[EventQueries]]. */
object StreamPipelines {

  /** Fixture events schema with ts already as TimestampType (the streaming
    * reader can't use the nanos runtime conf trick on a schema-less
    * stream, so streams declare the post-conversion schema). */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Incremental file-source read of a directory of event parquet files.
    * `maxFilesPerTrigger` bounds each micro-batch (the initial listing is
    * processed oldest-modification-first, n files per trigger) — the knob
    * that turns a pre-populated directory into a deterministic replay. */
  def readEventsStream(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val r = spark.readStream.schema(eventSchema)
    maxFilesPerTrigger.fold(r)(n => r.option("maxFilesPerTrigger", n))
      .parquet(dir)
  }

  /** Tumbling-window counts + decimal sums; append-mode emittable once the
    * watermark passes window end. State is bounded by the watermark —
    * at scale the state store holds only open windows per key. */
  def windowedCounts(events: DataFrame, windowDur: String = "1 hour",
      watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(dec("value")).cast(D).as("sum_value"))
      .select(col("window.start").as("win_start"),
        col("window.end").as("win_end"),
        col("event_type"), col("cnt"), col("sum_value"))

  /** Keep-first dedup on (user_id, event_type) with watermark-bounded
    * dedup state (exactly the reference pipeline's idempotent-staging
    * intent, incremental form). */
  def dedupWithinWatermark(events: DataFrame,
      watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("user_id", "event_type")

  /** 30-min-gap session windows per user (merging sessions, watermarked). */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"),
        col("user_id"), col("cnt"))

  /** Per-user running totals via explicit state — the
    * mapGroupsWithState custom-state surface. `idleTimeout` bounds the
    * state store on unbounded key spaces: a user idle longer than the
    * timeout has its state evicted (totals restart on next activity).
    * None keeps state forever — only sane for bounded key sets. */
  case class UserEvent(user_id: Long, value: Double)
  case class UserTotal(user_id: Long, n: Long, total: Double)

  def runningUserTotals(events: Dataset[UserEvent],
      idleTimeout: Option[String] = None): Dataset[UserTotal] = {
    import events.sparkSession.implicits._
    val timeoutConf = if (idleTimeout.isDefined)
      GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserTotal, UserTotal](timeoutConf) {
        (uid: Long, rows: Iterator[UserEvent], state: GroupState[UserTotal]) =>
          if (state.hasTimedOut) {
            val last = state.get
            state.remove()
            last
          } else {
            val prev = state.getOption.getOrElse(UserTotal(uid, 0L, 0.0))
            var n = prev.n
            var tot = prev.total
            rows.foreach { e => n += 1; tot += e.value }
            val next = UserTotal(uid, n, tot)
            state.update(next)
            idleTimeout.foreach(state.setTimeoutDuration)
            next
          }
      }
  }

  /** Write an append stream to parquet with checkpointing (exactly-once
    * file sink). Returns the started query; caller awaits/ stops. */
  def writeParquetStream(df: DataFrame, outDir: String, checkpoint: String) =
    df.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .format("parquet")
      .option("path", outDir)
      .start()

  /** Micro-batch upsert load — the incremental form of the reference's
    * declared Redshift load (`README.md:2`): each micro-batch is merged
    * into the serving table under `tableDir` by key via
    * [[graft.sources.Staging.upsert]] (same-key rows replaced, new keys
    * appended), so the table converges to one row per key no matter how
    * the stream splits into batches. foreachBatch is the Spark-native
    * MERGE sink for plain-parquet targets; on a transactional format the
    * same batch function becomes MERGE INTO. Batches with duplicate keys
    * keep the LAST row per key, ties broken by the remaining columns so
    * retries pick the same winner.
    *
    * Crash safety: each batch writes a NEW `v<batchId>` subdirectory and
    * then flips the `_CURRENT` pointer file. A crash mid-write leaves the
    * previous version intact and current; the replayed batch re-merges
    * against it and overwrites its own `v<batchId>` dir (key-merge is
    * idempotent). Readers go through [[readServingTable]], which falls
    * back to the highest complete version if the pointer itself was lost
    * mid-flip. In-place `mode("overwrite")` of the live dir would have
    * neither property (delete happens before commit).
    *
    * `retainVersions` is the table's time-travel horizon: the newest N
    * version dirs survive each batch's retention pass (default 2 — the
    * committed version plus its predecessor, the minimum crash-safe
    * setting; a deployment wanting table@vN reads via
    * [[readServingTableAt]] raises it). Each retained version is a
    * complete self-contained snapshot (full merge, not a delta), so
    * retention cost is N × table size — the flat-file analog of a Delta/
    * Iceberg snapshot chain without the manifest machinery. */
  def upsertLoadStream(updates: DataFrame, keys: Seq[String],
      orderCol: String, tableDir: String, checkpoint: String,
      retainVersions: Int = 2) = {
    val spark = updates.sparkSession
    updates.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val orderCols = desc(orderCol) +:
          batch.columns.filterNot(c => keys.contains(c) || c == orderCol)
            .map(col(_).asc).toSeq
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(keys.map(col): _*)
          .orderBy(orderCols: _*)
        val deduped = batch
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
        val merged = currentServingVersion(spark, tableDir) match {
          case Some(cur) =>
            // materialized merge (localCheckpoint) so the write never
            // depends on files a concurrent retry might replace
            graft.sources.Staging
              .upsert(spark.read.parquet(s"$tableDir/$cur"), deduped, keys,
                validate = false)
              .localCheckpoint(true)
          case None => deduped
        }
        merged.write.mode("overwrite").parquet(s"$tableDir/v$batchId")
        // flip the pointer: temp file + rename (atomic on HDFS/local);
        // worst case the pointer is briefly absent and readers fall back
        // to the highest version — which is the one just committed
        val hfs = new org.apache.hadoop.fs.Path(tableDir).getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        val tmp = new org.apache.hadoop.fs.Path(tableDir, "_CURRENT.tmp")
        val cur = new org.apache.hadoop.fs.Path(tableDir, "_CURRENT")
        val out = hfs.create(tmp, true)
        out.write(s"v$batchId".getBytes("UTF-8")); out.close()
        hfs.delete(cur, false)
        hfs.rename(tmp, cur)
        // retention: keep the newest `retainVersions` dirs — at the
        // default 2 that's the committed version plus its predecessor
        // (for readers that resolved the pointer just before the flip)
        hfs.listStatus(new org.apache.hadoop.fs.Path(tableDir))
          .map(_.getPath)
          .filter(p => p.getName.matches("v\\d+") &&
            p.getName.drop(1).toLong <= batchId - retainVersions.toLong)
          .foreach(p => hfs.delete(p, true))
        ()
      }
      .start()
  }

  /** Resolve the live version of an [[upsertLoadStream]] serving table:
    * the `_CURRENT` pointer, or the highest `v<n>` directory when the
    * pointer is mid-flip/lost. None = table not created yet. */
  def currentServingVersion(spark: SparkSession,
      tableDir: String): Option[String] = {
    val root = new org.apache.hadoop.fs.Path(tableDir)
    val hfs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!hfs.exists(root)) return None
    val cur = new org.apache.hadoop.fs.Path(root, "_CURRENT")
    val pointed =
      if (hfs.exists(cur)) {
        val in = hfs.open(cur)
        val s = scala.io.Source.fromInputStream(in).mkString.trim
        in.close()
        Some(s).filter(v => hfs.exists(new org.apache.hadoop.fs.Path(root, v)))
      } else None
    pointed.orElse {
      val versions = hfs.listStatus(root).map(_.getPath.getName)
        .filter(_.matches("v\\d+"))
      if (versions.isEmpty) None
      else Some(versions.maxBy(_.drop(1).toLong))
    }
  }

  /** Read the live version of an [[upsertLoadStream]] serving table. */
  def readServingTable(spark: SparkSession, tableDir: String): DataFrame =
    currentServingVersion(spark, tableDir) match {
      case Some(v) => spark.read.parquet(s"$tableDir/$v")
      case None => throw new java.util.NoSuchElementException(
        s"no serving-table version under $tableDir")
    }

  /** TIME-TRAVEL read: a PINNED version of an [[upsertLoadStream]]
    * serving table (`version` = "v<batchId>"). Every version dir is a
    * complete snapshot — the merge of the micro-batch prefix up through
    * that batch — so table@vN is exactly what a reader at batch-N time
    * saw: the primitive reproducible training runs pin their corpus
    * with. Loud on a vacuumed/unknown version, listing what IS
    * retained — silently falling back to _CURRENT would un-pin the
    * reader. */
  def readServingTableAt(spark: SparkSession, tableDir: String,
      version: String): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(tableDir)
    val hfs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v = new org.apache.hadoop.fs.Path(root, version)
    if (!hfs.exists(v)) {
      val have =
        if (!hfs.exists(root)) Array.empty[String]
        else hfs.listStatus(root).map(_.getPath.getName)
          .filter(_.matches("v\\d+")).sortBy(_.drop(1).toLong)
      throw new java.util.NoSuchElementException(
        s"serving-table version $version not retained under $tableDir " +
          s"(retained: ${have.mkString(",")})")
    }
    spark.read.parquet(v.toString)
  }
}
