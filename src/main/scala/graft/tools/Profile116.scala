package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev-only: phase breakdown of q116 — where does the warehouse-load
  * key's time go (Spark dedup, JDBC staging writes, warehouse MERGE,
  * read-back)? Run twice; read the WARM pass. */
object Profile116 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.entry(spark).count()
    def t[A](tag: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"PROFILE116 $tag ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    (1 to 2).foreach { pass =>
      println(s"--- pass $pass")
      val url = s"jdbc:derby:memory:prof116_$pass;create=true"
      val keep = Window.partitionBy("user_id")
        .orderBy(desc("ts"), col("event_id"))
      val batches = t("split") {
        graft.streaming.EventQueries
          .tsRangeSplit(graft.Tables.loadEvents(spark, sfDir), 3)
      }
      batches.zipWithIndex.foreach { case (b, i) =>
        val d = t(s"dedup$i") {
          val x = b.withColumn("__rn", row_number().over(keep))
            .filter(col("__rn") === 1).drop("__rn").coalesce(4)
          x.localCheckpoint(true) // materialize so upsert times only JDBC
        }
        t(s"upsert$i") {
          graft.sources.JdbcWarehouse.upsert(d, url, "serve", Seq("user_id"))
        }
      }
      t("readback") {
        graft.sources.JdbcWarehouse.readTable(spark, url, "serve")
          .orderBy("user_id").count()
      }
    }
    spark.stop()
  }
}
