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
  * container and streams records off `DataFileReader` (closed on
  * exhaustion AND via a task-completion hook, so early-stopping
  * consumers like `limit` don't leak the stream), never materializing
  * a file in memory. Nullable fields
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

  /** The session's EFFECTIVE Hadoop configuration as a serializable
    * key/value list (Configuration itself is not Serializable and the
    * task closures run executor-side): iterating a live Configuration
    * yields loaded defaults plus every spark.hadoop.* override, so the
    * loadDefaults=false rebuild in [[hadoopConf]] is faithful. */
  private def serializableHadoopConf(s: SparkSession): Seq[(String, String)] = {
    val c = s.sparkContext.hadoopConfiguration
    c.iterator().asScala.map(e => e.getKey -> e.getValue).toList
  }

  private def hadoopConf(kv: Seq[(String, String)]): Configuration = {
    val c = new Configuration(false)
    kv.foreach { case (k, v) => c.set(k, v) }
    c
  }

  /** Stage `df` (doc_id, lang, source, n_chars, text) as one Avro
    * container file per partition under `dir`. */
  def write(df: DataFrame, dir: String): Unit = {
    // ship the SESSION Hadoop configuration into the tasks (a bare
    // `new Configuration()` executor-side would drop every
    // spark.hadoop.* setting — s3a credentials/endpoints — making the
    // "HDFS/s3a differ only by URI" claim above false off-box)
    val hc = serializableHadoopConf(df.sparkSession)
    val n = df.rdd.mapPartitionsWithIndex { (i, rows) =>
      if (!rows.hasNext) Iterator.empty
      else {
        val schema = new Schema.Parser().parse(SchemaJson)
        val path = new Path(f"$dir/part-$i%05d.avro")
        val out = path.getFileSystem(hadoopConf(hc)).create(path, true)
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
    val hc = serializableHadoopConf(spark)
    val rows = spark.sparkContext
      .parallelize(files.toIndexedSeq, math.max(files.length, 1))
      .flatMap { f =>
        val rdr = new DataFileReader[GenericRecord](
          new FsInput(new Path(f), hadoopConf(hc)),
          new GenericDatumReader[GenericRecord]())
        var closed = false
        def closeOnce(): Unit = if (!closed) { closed = true; rdr.close() }
        // a consumer that stops early (limit, take) never reaches the
        // close-on-exhaustion below — the task-completion hook closes
        // the reader (and its input stream) either way
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => closeOnce()))
        val it = rdr.iterator().asScala
        def str(v: AnyRef): String = if (v == null) null else v.toString
        new Iterator[Row] {
          // stream off the reader, closing exactly when exhausted
          def hasNext: Boolean = {
            val h = it.hasNext
            if (!h) closeOnce()
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
