package graft.plans

import scala.util.Random

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.plans.TopKAgg.topk_agg

/** TopKAgg correctness against the window formulation it replaces,
  * under shapes the q99 fixture doesn't stress: duplicate values
  * (tiebreak), groups smaller than k, and many partitions (merge
  * path). */
class TopKAggSpec extends SparkSpec {

  test("heap aggregate equals row_number window on adversarial data") {
    val sess = spark
    import sess.implicits._
    val rnd = new Random(7)
    // 200 groups, skewed sizes 1..60, values drawn from a SMALL set so
    // ties are everywhere and the id tiebreak is load-bearing
    val rows = (0 until 200).flatMap { g =>
      (0 until (1 + rnd.nextInt(60))).map { _ =>
        (g.toLong, rnd.nextInt(8).toDouble, rnd.nextLong().abs)
      }
    }
    val df = rows.toDF("g", "v", "id").repartition(13)

    val viaAgg = df.groupBy("g")
      .agg(topk_agg(col("v"), col("id"), 5).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), (col("pos") + 1).cast("long").as("rn"),
        col("col.id").as("id"), col("col.value").as("v"))

    val w = Window.partitionBy("g").orderBy(desc("v"), col("id"))
    val viaWindow = df
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 5)
      .select("g", "rn", "id", "v")

    assert(viaAgg.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(viaAgg).isEmpty,
      "bounded-heap top-k must equal the window formulation exactly")
  }

  test("distinctIds: multi-band repeats equal the window over the distinct stream") {
    val sess = spark
    import sess.implicits._
    val rnd = new Random(11)
    // q163's input shape: (group, id) pairs whose value is a pure
    // function of the pair, each surfacing 1..4 times (multi-band LSH
    // collisions), scattered across partitions so dedup has to hold on
    // BOTH the update path and the partial-merge path
    val base = (0 until 120).flatMap { g =>
      (0 until (1 + rnd.nextInt(40))).map { j =>
        (g.toLong, (j * 31 % 9).toDouble, rnd.nextLong().abs)
      }
    }.distinct
    val repeated = base.flatMap(r => Seq.fill(1 + rnd.nextInt(4))(r))
    val df = new Random(3).shuffle(repeated).toDF("g", "v", "id").repartition(17)

    val viaAgg = df.groupBy("g")
      .agg(TopKAgg.topk_distinct_agg(col("v"), col("id"), 5).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), (col("pos") + 1).cast("long").as("rn"),
        col("col.id").as("id"), col("col.value").as("v"))

    val w = Window.partitionBy("g").orderBy(desc("v"), col("id"))
    val viaWindow = df.distinct()
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 5)
      .select("g", "rn", "id", "v")

    assert(viaAgg.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(viaAgg).isEmpty,
      "distinctIds heap must equal distinct() + window exactly")
  }

  test("distinctIds: a re-arrival of an evicted id cannot re-enter the heap") {
    val sess = spark
    import sess.implicits._
    // one group, k=2: id 7 (v=1.0) enters, is evicted by 8 and 9
    // (v=3.0, 2.0), then arrives again — the heap must stay {9, 8}
    val df = Seq((1L, 1.0, 7L), (1L, 3.0, 8L), (1L, 2.0, 9L), (1L, 1.0, 7L))
      .toDF("g", "v", "id").coalesce(1)
    val out = df.groupBy("g")
      .agg(TopKAgg.topk_distinct_agg(col("v"), col("id"), 2).as("top"))
      .select(explode(col("top.id"))).as[Long].collect()
    assert(out.toSeq === Seq(8L, 9L))
  }

  test("sort-based fallback (groups over the threshold) equals the hash path") {
    // Past spark.sql.objectHashAggregate.sortBased.fallbackThreshold
    // (default 128 — kept at default, see the Tables.scala note) Spark
    // sorts the remaining input in-partition and aggregates sorted
    // runs — the memory-safe path q163's >128-group partials actually
    // take. Exercise it: the same adversarial frame under thresholds
    // that force fallback IMMEDIATELY (1) and MID-STREAM (16, so both
    // paths mix and partials from each merge) must match the default
    // run.
    val sess = spark
    import sess.implicits._
    val rnd = new Random(23)
    val rows = (0 until 300).flatMap { g =>
      (0 until (1 + rnd.nextInt(30))).map { _ =>
        (g.toLong, rnd.nextInt(6).toDouble, rnd.nextLong().abs)
      }
    }
    val df = rows.toDF("g", "v", "id").repartition(7)
    def run() = df.groupBy("g")
      .agg(topk_agg(col("v"), col("id"), 3).as("top"),
        TopKAgg.topk_distinct_agg(col("v"), col("id"), 3).as("topd"))
      .collect().map(r => (r.getLong(0), r.getSeq[Any](1), r.getSeq[Any](2)))
      .sortBy(_._1).toSeq
    val hash = run()
    val thr = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    for (t <- Seq("1", "16")) {
      val viaSort = graft.Tables.withConfs(spark, thr -> t)(run())
      assert(viaSort === hash,
        s"fallbackThreshold=$t must not change any heap result")
    }
  }

  test("groups smaller than k emit all their rows, strongest first") {
    val sess = spark
    import sess.implicits._
    val df = Seq((1L, 2.0, 10L), (1L, 9.0, 11L)).toDF("g", "v", "id")
    val out = df.groupBy("g")
      .agg(topk_agg(col("v"), col("id"), 5).as("top"))
      .select(posexplode(col("top")))
      .select(col("col.value")).as[Double].collect()
    assert(out.toSeq === Seq(9.0, 2.0))
  }
}
