package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.Row

import graft.SparkSpec

/** The Avro container round-trip behind q191: real codec, per-partition
  * containers, nullable-union totality. */
class AvroStageSpec extends SparkSpec {

  test("avro roundtrip preserves rows, NULLs and partition-file layout") {
    val dir = Files.createTempDirectory("graft_avro").toString
    val rows = Seq(
      Row(1L, "en", "web", 11L, "hello world"),
      // every nullable field null at once — the union-schema totality
      // the q178 sentinel pins for TSV must hold structurally here
      Row(2L, null, null, null, null),
      Row(3L, "de", "book", 3L, "abc"))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 2),
      AvroStage.ReadSchema)
    AvroStage.write(df, dir)
    // one container per non-empty upstream partition
    val files = new java.io.File(dir).listFiles
      .filter(_.getName.endsWith(".avro"))
    assert(files.length === 2, "expected one .avro container per partition")
    val back = AvroStage.read(spark, dir).collect()
      .sortBy(_.getLong(0)).toSeq
    assert(back === rows, "avro read-back must be byte-faithful, nulls included")
    // a directory no write ever fed reads as empty
    val never = Files.createTempDirectory("graft_avro_e").toString + "/x"
    assert(AvroStage.read(spark, never).count() === 0L)
  }
}
