package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

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

  /** `events.ts` is parquet TIMESTAMP(NANOS); Spark 4.1.2 throws
    * [PARQUET_TYPE_ILLEGAL] on it. Read nanos as long + floor-divide to
    * micros — identical to DuckDB's TIMESTAMP_NS → TIMESTAMP cast for
    * positive epochs (contract D9). The conf is a runtime SQL conf set here
    * because the driver owns SparkSession construction. */
  def loadEvents(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }
}
