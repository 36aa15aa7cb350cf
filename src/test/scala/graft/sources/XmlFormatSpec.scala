package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** The built-in XML datasource contract behind q194: Spark 4 ships the
  * former spark-xml as `format("xml")`, and the round-trip key leans on
  * three behaviors this spec pins so a Spark upgrade that changed any of
  * them fails HERE, not as an opaque checksum mismatch in the gate:
  * entity escaping round-trips markup-significant characters, a NULL
  * field is written as an ABSENT element and read back as NULL (the
  * JSONL dropped-field shape, not an empty string), and surrounding
  * whitespace inside element text survives the default reader config
  * (values are not silently trimmed). */
class XmlFormatSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType),
    StructField("text", StringType)))

  private def roundtrip(rows: Seq[Row]): Seq[Row] = {
    val dir = Files.createTempDirectory("graft_xml").toString + "/d"
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 2), schema)
    df.write.format("xml")
      .option("rootTag", "docs").option("rowTag", "doc").save(dir)
    spark.read.format("xml").schema(schema).option("rowTag", "doc")
      .load(dir).collect().sortBy(_.getLong(0)).toSeq
  }

  test("xml roundtrip escapes markup chars and keeps interior spacing") {
    val rows = Seq(
      Row(1L, "en", "web", 26L, "a < b && b > c \"quoted\" 'q'"),
      // double interior spaces and tabs must survive verbatim — the
      // q194 checksum hashes every char, so a trim here would be a
      // silent corpus mutation
      Row(2L, "de", "book", 9L, "two  spaces\tand a tab"))
    assert(roundtrip(rows) === rows,
      "xml read-back must be char-faithful incl. escapes and whitespace")
  }

  test("xml writes NULL fields as absent elements that read back as NULL") {
    val rows = Seq(
      Row(1L, "en", "web", 11L, "hello world"),
      Row(2L, null, null, null, null))
    assert(roundtrip(rows) === rows,
      "absent element must read back as NULL in every nullable field")
  }
}
