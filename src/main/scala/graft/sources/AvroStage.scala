package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container-file staging for the documents shape — the remaining
  * mainstream row format after parquet/CSV/JSONL/ORC/text (q140–q142,
  * q178). The `spark-avro` datasource module is not on this classpath
  * (offline build), but Avro CORE is (`avro` + `avro-mapred` ship in
  * Spark's own jars), so the round-trip runs the real codec —
  * `DataFileWriter`/`DataFileReader` over `GenericRecord` — behind
  * `mapPartitions`, the same justified boundary as the multimodal
  * codecs (a container-file writer is not an `Expression`).
  *
  * Scale shape: the writer emits ONE .avro container per upstream
  * partition (so file count and size follow the source partitioning —
  * `maxPartitionBytes`-bounded, never a driver funnel), through the
  * Hadoop FileSystem API so `file://` here and HDFS/`s3a://` in
  * production differ only by URI. The reader parallelizes one task per
  * container and streams records off `DataFileReader` (closing on
  * exhaustion), never materializing a file in memory. Nullable fields
  * use Avro UNION types — the total-contract lesson q178 pins for TSV
  * applies at the schema level here, so a null round-trips as a null
  * rather than poisoning the writer. */
object AvroStage {

  /** Avro schema for (doc_id, lang, source, n_chars, text) with
    * nullable metadata — the documents staging shape. */
  private val SchemaJson =
    """{"type":"record","name":"Doc","namespace":"graft","fields":[
      |{"name":"doc_id","type":"long"},
      |{"name":"lang","type":["null","string"],"default":null},
      |{"name":"source","type":["null","string"],"default":null},
      |{"name":"n_chars","type":["null","long"],"default":null},
      |{"name":"text","type":["null","string"],"default":null}]}"""
      .stripMargin

  val ReadSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType),
    StructField("text", StringType)))

  /** Stage `df` (doc_id, lang, source, n_chars, text) as one Avro
    * container file per partition under `dir`. */
  def write(df: DataFrame, dir: String): Unit = {
    val n = df.rdd.mapPartitionsWithIndex { (i, rows) =>
      if (!rows.hasNext) Iterator.empty
      else {
        val schema = new Schema.Parser().parse(SchemaJson)
        val path = new Path(f"$dir/part-$i%05d.avro")
        val out = path.getFileSystem(new Configuration()).create(path, true)
        val w = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](schema))
        w.create(schema, out)
        try rows.foreach { r =>
          val rec = new GenericData.Record(schema)
          rec.put("doc_id", r.getLong(0))
          rec.put("lang", if (r.isNullAt(1)) null else r.getString(1))
          rec.put("source", if (r.isNullAt(2)) null else r.getString(2))
          rec.put("n_chars",
            if (r.isNullAt(3)) null else java.lang.Long.valueOf(r.getLong(3)))
          rec.put("text", if (r.isNullAt(4)) null else r.getString(4))
          w.append(rec)
        } finally w.close()
        Iterator.single(1)
      }
    }.count()
    require(n >= 0) // force materialization (count executes the write)
  }

  /** Read every Avro container under `dir` back as a DataFrame, one
    * task per container file. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files =
      if (!fs.exists(p)) Array.empty[String]
      else fs.listStatus(p).map(_.getPath)
        .filter(_.getName.endsWith(".avro")).map(_.toString).sorted
    val rows = spark.sparkContext
      .parallelize(files.toIndexedSeq, math.max(files.length, 1))
      .flatMap { f =>
        val rdr = new DataFileReader[GenericRecord](
          new FsInput(new Path(f), new Configuration()),
          new GenericDatumReader[GenericRecord]())
        val it = rdr.iterator().asScala
        def str(v: AnyRef): String = if (v == null) null else v.toString
        new Iterator[Row] {
          // stream off the reader, closing exactly when exhausted
          def hasNext: Boolean = {
            val h = it.hasNext
            if (!h) rdr.close()
            h
          }
          def next(): Row = {
            val r = it.next()
            Row(r.get("doc_id").asInstanceOf[Long], str(r.get("lang")),
              str(r.get("source")), r.get("n_chars").asInstanceOf[java.lang.Long],
              str(r.get("text")))
          }
        }
      }
    spark.createDataFrame(rows, ReadSchema)
  }
}
