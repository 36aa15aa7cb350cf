package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.plans.MisraGriesAgg.misra_gries
import graft.plans.TopKAgg.topk_agg

/** The round-5 mergeable kernels under TRUE incremental execution:
  * a TypedImperativeAggregate participates in streaming state exactly
  * because its buffer serializes and merges — the state store holds the
  * partial (MG counter table / bounded heap) between micro-batches, and
  * each batch's partials merge into it. Incremental result must equal
  * the one-shot batch result on the full stream. */
class StreamingKernelSpec extends SparkSpec {

  test("Misra-Gries summary maintained incrementally equals the batch summary") {
    val sess = spark
    import sess.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[String]
    val q = input.toDF().toDF("tok")
      .groupBy()
      .agg(misra_gries(col("tok"), 8).as("s"))
      .select(col("s.cand").as("cand"), col("s.n").as("n"))
      .writeStream.format("memory").queryName("mg_stream")
      .outputMode("complete").start()
    try {
      val b1 = Seq.fill(40)("a") ++ Seq.fill(25)("b") ++
        (0 until 30).map(i => s"t$i")
      val b2 = Seq.fill(35)("a") ++ Seq.fill(20)("c") ++
        (30 until 60).map(i => s"t$i")
      input.addData(b1)
      q.processAllAvailable()
      input.addData(b2)
      q.processAllAvailable()
      val inc = spark.sql("SELECT * FROM mg_stream").collect().head
      val incCand = inc.getSeq[String](0).toSet
      val incN = inc.getLong(1)

      val all = b1 ++ b2
      assert(incN === all.size.toLong,
        "exact tally must accumulate across micro-batches")
      // the MG guarantee must hold for the stream as a whole
      val exact = all.groupBy(identity).view.mapValues(_.size).toMap
      val mustHave = exact.collect {
        case (item, c) if c > all.size.toDouble / 9 => item
      }.toSet
      assert(mustHave.nonEmpty)
      assert(mustHave.subsetOf(incCand),
        s"incremental MG lost guaranteed items: ${mustHave -- incCand}")
    } finally q.stop()
  }

  test("bounded-heap top-k maintained incrementally equals batch sort-take") {
    val sess = spark
    import sess.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(String, Double, Long)]
    val q = input.toDF().toDF("g", "v", "id")
      .groupBy("g")
      .agg(topk_agg(col("v"), col("id"), 3).as("top"))
      .writeStream.format("memory").queryName("topk_stream")
      .outputMode("complete").start()
    try {
      val b1 = Seq(("x", 5.0, 1L), ("x", 9.0, 2L), ("y", 1.0, 3L))
      val b2 = Seq(("x", 7.0, 4L), ("x", 9.0, 5L), ("y", 2.0, 6L),
        ("x", 3.0, 7L))
      input.addData(b1)
      q.processAllAvailable()
      input.addData(b2)
      q.processAllAvailable()
      val inc = spark.sql(
        """SELECT g, t.value, t.id
          |FROM topk_stream LATERAL VIEW explode(top) AS t""".stripMargin)
        .as[(String, Double, Long)].collect().toSet
      val want = (b1 ++ b2).groupBy(_._1).flatMap { case (g, rows) =>
        rows.map { case (_, v, i) => (v, i) }
          .sortBy { case (v, i) => (-v, i) }.take(3)
          .map { case (v, i) => (g, v, i) }
      }.toSet
      assert(inc === want,
        "state-store heap across micro-batches must equal batch top-k")
    } finally q.stop()
  }
}
