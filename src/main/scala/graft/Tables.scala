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

  /** Group capacity for ObjectHashAggregateExec before it falls back to
    * sort-based aggregation, applied by every session builder (Verify,
    * Bench, KeyBench, the test harness). Spark's default is 128 — a
    * conservative guard because object-agg buffers are opaque to the
    * memory manager — which silently re-introduces a full in-partition
    * sort of the INPUT stream for any object aggregate with more than
    * 128 groups per partition: q163's bounded-heap kNN ranking would
    * sort the whole O(candidates) stream it exists to avoid sorting,
    * and q99's per-customer top-k would sort the orders table.
    *
    * The cap is sized from the UNTRACKED-heap arithmetic the default
    * exists to guard (object-agg hash maps live outside the unified
    * memory manager): the repo's object aggs that meet HIGH group
    * cardinality all carry tiny contract-bounded buffers (TopKAgg:
    * k ≤ 5 ⇒ two 5-slot primitive arrays, ~300 B/group with map-entry
    * overhead), so the 2^18 cap is ≈ 80 MB per task ≈ 2.5 GB at 32
    * concurrent local tasks worst case — sized to the 8 GB
    * forked-driver default alongside the ~60%-of-heap unified pool,
    * and measured at the cap's own design point (q163's 200k-vector
    * one-side probe runs ~200k live heaps per task on the hash path).
    * Beyond the cap, Spark's sort-based fallback IS the designed spill
    * path — bounded memory, an in-partition disk sort of the remaining
    * input, partial output still ≤ k entries per group — so oversized
    * partitions degrade to disk instead of OOM. The gated fixture
    * scales sit far below it (sf3's 60k vectors ≪ 2^18); the KB-scale
    * buffers (CountMinAgg, MisraGriesAgg, SimHashAgg, MinHashAgg)
    * aggregate into O(1)–O(docs-per-partition) groups by construction
    * and never approach the cap. */
  val ObjectAggGroupCapacity: String = (1 << 18).toString

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
