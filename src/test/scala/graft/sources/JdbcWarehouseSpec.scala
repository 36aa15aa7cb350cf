package graft.sources

import java.sql.Timestamp

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** The warehouse-connector path exercised end-to-end against embedded
  * Derby (ships on every Spark classpath): distributed JDBC staging
  * write + warehouse-side MERGE INTO — the reference's declared Redshift
  * load stage with a real database on the other end. */
class JdbcWarehouseSpec extends SparkSpec {

  // keep Derby's derby.log and db directories out of the repo cwd
  System.setProperty("derby.system.home",
    java.nio.file.Files.createTempDirectory("graft_derby").toString)

  private var dbId = 0
  private def freshUrl(): String = {
    dbId += 1
    s"jdbc:derby:memory:graftwh$dbId;create=true"
  }

  test("load + readTable round-trips through a real JDBC database") {
    val sess = spark
    import sess.implicits._
    val url = freshUrl()
    val df = Seq((1L, "alpha", 1.5), (2L, "beta", 2.5)).toDF("id", "name", "v")
    JdbcWarehouse.load(df, url, "t_load", SaveMode.ErrorIfExists)
    assert(JdbcWarehouse.tableExists(url, "t_load"))
    assert(!JdbcWarehouse.tableExists(url, "t_missing"))
    val back = JdbcWarehouse.readTable(spark, url, "t_load")
      .orderBy("id").collect()
    assert(back.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(back.map(_.getDouble(2)).toSeq === Seq(1.5, 2.5))
    // append mode adds rows
    JdbcWarehouse.load(Seq((3L, "gamma", 3.5)).toDF("id", "name", "v"),
      url, "t_load", SaveMode.Append)
    assert(JdbcWarehouse.readTable(spark, url, "t_load").count() === 3)
  }

  test("upsert MERGEs warehouse-side: updates matched keys, inserts new") {
    val sess = spark
    import sess.implicits._
    val url = freshUrl()
    // first batch: no target yet -> plain load
    JdbcWarehouse.upsert(
      Seq((1L, 10.0, 100L), (2L, 20.0, 100L), (3L, 30.0, 100L))
        .toDF("id", "v", "ts"),
      url, "t_up", Seq("id"))
    // second batch: id=2 updated, id=4 new
    JdbcWarehouse.upsert(
      Seq((2L, 99.0, 200L), (4L, 40.0, 200L)).toDF("id", "v", "ts"),
      url, "t_up", Seq("id"))
    val back = JdbcWarehouse.readTable(spark, url, "t_up")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(back.toSeq === Seq((1L, 10.0), (2L, 99.0), (3L, 30.0), (4L, 40.0)))
    // the staging table must not linger after the merge
    assert(!JdbcWarehouse.tableExists(url, "t_up_stg"))
  }

  test("upsert orderCol dedupes intra-batch duplicate keys keep-latest") {
    val sess = spark
    import sess.implicits._
    val url = freshUrl()
    JdbcWarehouse.upsert(
      Seq((1L, 1.0, 100L)).toDF("id", "v", "ts"), url, "t_dup", Seq("id"))
    // one batch carries ts=300 and ts=200 for the same key -> 300 wins
    JdbcWarehouse.upsert(
      Seq((1L, 5.0, 300L), (1L, 3.0, 200L), (2L, 2.0, 250L))
        .toDF("id", "v", "ts"),
      url, "t_dup", Seq("id"), orderCol = Some("ts"))
    val back = JdbcWarehouse.readTable(spark, url, "t_dup")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(back.toSeq === Seq((1L, 5.0), (2L, 2.0)))
  }

  test("upsert matches NULL keys null-safely instead of re-inserting") {
    val sess = spark
    import sess.implicits._
    val url = freshUrl()
    JdbcWarehouse.upsert(
      Seq((Some(1L), 1.0), (None, 7.0)).toDF("id", "v"),
      url, "t_nk", Seq("id"))
    // a bare t.id = s.id would see NULL != NULL, take NOT MATCHED, and
    // append a duplicate NULL-key row on every batch
    JdbcWarehouse.upsert(
      Seq((Option.empty[Long], 8.0)).toDF("id", "v"),
      url, "t_nk", Seq("id"))
    val back = JdbcWarehouse.readTable(spark, url, "t_nk")
      .orderBy(col("id").asc_nulls_last).collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)), r.getDouble(1)))
    assert(back.toSeq === Seq((Some(1L), 1.0), (None, 8.0)),
      "the NULL-key row must be UPDATED, not duplicated")
  }

  test("foreachBatch streams micro-batches into the warehouse upsert") {
    // the full reference-shaped pipeline: incremental stream -> staging
    // write -> warehouse MERGE per micro-batch, converging the serving
    // table to latest-per-key
    val sess = spark
    import sess.implicits._
    implicit val ctx = spark.sqlContext
    val url = freshUrl()
    val input = MemoryStream[(Long, Long, Double)]
    val q = input.toDF().toDF("user_id", "ts", "v")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        JdbcWarehouse.upsert(batch, url, "t_serve",
          Seq("user_id"), orderCol = Some("ts"))
      }
      .start()
    try {
      input.addData((7L, 100L, 1.0), (8L, 100L, 2.0))
      q.processAllAvailable()
      input.addData((7L, 200L, 9.0), (9L, 150L, 3.0)) // 7 updated, 9 new
      q.processAllAvailable()
    } finally q.stop()
    val back = JdbcWarehouse.readTable(spark, url, "t_serve")
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    assert(back.toSeq === Seq((7L, 9.0), (8L, 2.0), (9L, 3.0)))
  }
}
