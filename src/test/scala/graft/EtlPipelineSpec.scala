package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.{JsonConfig, Staging}

/** End-to-end realization of the reference's declared pipeline
  * (`README.md:2`: App Store API → S3 staging → Spark transform →
  * Redshift load): JSON records land in staging, are flattened and
  * aggregated, upserted into the warehouse table, and the staging
  * prefix is vacuumed for the next cycle. */
class EtlPipelineSpec extends SparkSpec {

  test("full ETL cycle: stage JSON -> transform -> upsert load -> vacuum") {
    val sess = spark
    import sess.implicits._
    val base = Files.createTempDirectory("graft_etl").toString
    val staging = s"$base/staging/apps"
    val warehouse = s"$base/warehouse/app_stats"

    // config (the get_secret JSON analog)
    val cfg = JsonConfig.parse(spark,
      """{"staging_path": "apps", "min_rating": "3"}""")
    assert(cfg("min_rating") === "3")

    // extract: App-Store-ish JSON documents arrive in staging
    val records = Seq(
      """{"app_id": 1, "name": "Alpha", "price": 0.99, "rating": 4.5, "genres": ["games", "puzzle"]}""",
      """{"app_id": 2, "name": "Beta",  "price": 0.0,  "rating": 2.0, "genres": ["tools"]}""",
      """{"app_id": 3, "name": "Gamma", "price": 4.99, "rating": 5.0, "genres": ["games"]}""")
    Staging.store(records.toDF("json"), staging, format = "text")
    assert(Staging.keysList(spark, staging).nonEmpty)

    // transform: parse, filter by config, flatten genres, aggregate
    val schema = "app_id LONG, name STRING, price DOUBLE, rating DOUBLE, genres ARRAY<STRING>"
    val parsed = spark.read.textFile(staging)
      .select(from_json(col("value"), lit(schema)).as("r"))
      .select("r.*")
      .filter(col("rating") >= cfg("min_rating").toDouble)
    val stats = parsed
      .select(col("app_id"), explode(col("genres")).as("genre"))
      .groupBy("genre")
      .agg(count(lit(1)).as("n_apps"))

    // load: upsert into the warehouse (second cycle replaces genre rows)
    val existing = Seq(("games", 99L), ("news", 1L)).toDF("genre", "n_apps")
    val merged = Staging.upsert(existing, stats, Seq("genre"))
    Staging.store(merged, warehouse)
    val loaded = spark.read.parquet(warehouse)
      .orderBy("genre").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(loaded.toSeq === Seq(("games", 2L), ("news", 1L), ("puzzle", 1L)))

    // idempotency: vacuum staging for the next cycle
    assert(Staging.vacuum(spark, staging))
    assert(Staging.keysList(spark, staging).isEmpty)
  }
}
