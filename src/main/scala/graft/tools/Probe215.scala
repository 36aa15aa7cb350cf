package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Probe215 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- args) {
      val docs = graft.Tables.tWide(spark, dir, "documents")
      val sig = graft.operators.LlmQueries.minhashSignatures(docs)
      val nSig = sig.select("sig").distinct().count()
      val out = graft.operators.LlmQueries.minhashSurvivors(spark, docs)
      val nClu = out.count()
      val nDocs = out.agg(sum("n_docs")).head().getLong(0)
      println(s"[probe215] $dir: distinct_sigs=$nSig clusters=$nClu docs_clustered=$nDocs")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
