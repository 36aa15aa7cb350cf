package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType, TimestampNTZType, TimestampType}

/** Shared fixture loaders + determinism helpers (SURVEY.md §1b, §2b D1–D9).
  *
  * The reference's staging layer (santoroc/appstore-aws-etl
  * `utils/utils/s3.py:16-23` key listing, `s3.py:26-30` object store) maps
  * to Spark's implicit parquet file discovery + `df.write` here; S3A vs
  * local path is a config concern, not code (SURVEY.md §2a).
  */
object Tables {

  /** DECIMAL(18,4): exact accumulation for money/qty columns (contract D2). */
  val D: DecimalType = DecimalType(18, 4)

  /** DECIMAL(18,6): for 3-factor products (price*(1-disc)*(1+tax)) whose
    * exact value carries up to 6 fractional digits — no rounding at all. */
  val D6: DecimalType = DecimalType(18, 6)

  def dec(c: Column): Column = c.cast(D)
  def dec(name: String): Column = dec(col(name))
  def dec6(c: Column): Column = c.cast(D6)

  /** Plain parquet table loader. Schema-on-read from the parquet footer. */
  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Loader for tables feeding compute-heavy per-row work (shingling,
    * vector folds, hashing). The fixture tables are single small parquet
    * files → a single input partition → serial execution of everything
    * before the first shuffle. On a real cluster the file count provides
    * scan parallelism; here an explicit round-robin repartition restores
    * it. The extra shuffle moves only the small source table — always
    * cheaper than serializing the downstream CPU work. */
  def tWide(spark: SparkSession, sfDir: String, name: String): DataFrame =
    t(spark, sfDir, name)
      .repartition(spark.sparkContext.defaultParallelism)

  /** NOTE on `spark.sql.objectHashAggregate.sortBased.fallbackThreshold`:
    * leave it at Spark's default (128 groups). Raising it session-wide
    * was tried in r17 for q163's bounded-heap ranking and MEASURED
    * harmful: ObjectHashAggregateExec also serves Spark's own object
    * aggregates (collect_list/collect_set, HLL, percentile_approx)
    * whose buffers are UNBOUNDED per group, so a raised cap lets any
    * such aggregation hold GBs of untracked heap — across a 228-key
    * bench session the heap bloat compounded until memory-heavy keys
    * GC-thrashed (q55: 4.8 s at default → 21–71 s at 2^18, fully
    * recovered on revert; totals 284 → 372/412 → 292 s). The sort-based
    * fallback the default forces on >128-group object aggs is the
    * memory-safe path and measured CHEAP for the repo's bounded-buffer
    * aggregates (q163's per-partition candidate sort costs ~0 next to
    * its kernel; sf1 4.3 s, better than the r16 window form's 7.9). */

  /** Run `body` with `spark.sql.shuffle.partitions` temporarily set to
    * `n`, restoring the caller's value after — the shared conf-swap
    * discipline for operators whose internal stages shuffle tiny frames
    * (streaming replays, iterative loops) where the session's default
    * partition count is pure near-empty-task scheduling overhead. Only
    * work that MATERIALIZES inside `body` sees the reduced setting; a
    * lazily returned plan evaluates under the restored value. */
  def withShufflePartitions[A](spark: SparkSession, n: Int)(body: => A): A = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, n.toString)
    try body finally spark.conf.set(key, prev)
  }

  /** General conf-swap: run `body` with the given session confs set,
    * restoring (or unsetting) each afterwards. Same discipline as
    * [[withShufflePartitions]] — only work that MATERIALIZES inside
    * `body` sees the settings; callers returning lazy plans must
    * collect within the block. */
  def withConfs[A](spark: SparkSession, kvs: (String, String)*)(body: => A): A = {
    val old = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** `events.ts` has shipped under two parquet encodings across fixture
    * generations, so this loader branches on the READ type rather than
    * assuming either (contract D9):
    *
    *  - TIMESTAMP(NANOS): Spark 4.1.2 throws [PARQUET_TYPE_ILLEGAL] unless
    *    `spark.sql.legacy.parquet.nanosAsLong` is set, which surfaces the
    *    column as LongType nanos → floor-divide to micros. Identical to
    *    DuckDB's TIMESTAMP_NS → TIMESTAMP cast for positive epochs.
    *  - TIMESTAMP_MICROS with isAdjustedToUTC=false: Spark reads
    *    TimestampNTZType → cast to TimestampType (session TZ is UTC, so
    *    the instant is unchanged and matches DuckDB's
    *    `CAST(ts AS TIMESTAMP)` on the same file).
    *
    * The nanosAsLong conf is harmless for micros files (it only affects
    * NANOS columns) and is a runtime SQL conf set here because the driver
    * owns SparkSession construction.
    *
    * The session time zone is pinned to UTC here too: the NTZ→Timestamp
    * cast is only instant-preserving under UTC, and DuckDB's replay of
    * the same file is TZ-naive — a non-UTC driver (Bench, ad-hoc tools)
    * would otherwise shift every events instant relative to the gated
    * path. Pinning at the ONE loader every events consumer goes through
    * beats auditing each SparkSession builder. */
  def loadEvents(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    val tsCol = raw.schema("ts").dataType match {
      case LongType                           => expr("timestamp_micros(ts div 1000)")
      case TimestampNTZType | TimestampType   => col("ts").cast(TimestampType)
      case other =>
        throw new IllegalStateException(
          s"events.ts: unsupported parquet read type $other — expected " +
            "LongType (nanosAsLong), TimestampNTZType, or TimestampType")
    }
    raw.withColumn("ts", tsCol)
  }
}
