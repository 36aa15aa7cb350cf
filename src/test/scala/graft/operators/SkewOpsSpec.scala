package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SkewOpsSpec extends SparkSpec {

  test("saltedJoin equals the plain join on skewed data") {
    val sess = spark
    import sess.implicits._
    // 90% of fact rows share one hot key
    val fact = (1 to 1000).map(i => (i.toLong, if (i <= 900) 1L else i.toLong % 7))
      .toDF("row_id", "k")
    val dim = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (4L, "c"), (5L, "d"),
      (6L, "e"), (0L, "f")).toDF("dk", "v")
    val plain = fact.join(dim, fact("k") === dim("dk"))
      .select("row_id", "k", "v").orderBy("row_id")
    val salted = SkewOps.saltedJoin(fact, dim, fact("k"), dim("dk"),
        fact("row_id"), salts = 8)
      .select("row_id", "k", "v").orderBy("row_id")
    assert(salted.collect().toSeq === plain.collect().toSeq)
  }

  /** Run `body` with SQL confs temporarily set, restoring after. */
  private def withConfs[A](pairs: (String, String)*)(body: => A): A = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("AQE skew-split handles the UNSALTED q74-shaped join at runtime; aggregation skew does not qualify") {
    // SURVEY §4's salting-vs-AQE boundary, pinned as executable
    // evidence. (a) A q74-shaped hot-key JOIN needs no salt when AQE is
    // on: OptimizeSkewedJoin splits the oversized shuffle partition and
    // replicates the matching side at runtime — the final adaptive plan
    // carries the skew markers. (b) The same hot key under a GROUP BY
    // (q97's shape) gets NO such help — AQE skew handling applies to
    // join exchanges only, and a final-aggregate partition must see all
    // rows of its key on one reducer; only two-phase salting (or
    // map-side partial combine, which high-cardinality-payload
    // aggregates defeat) spreads it. That asymmetry is why SkewOps
    // keeps BOTH a salted join (for when AQE is off/unavailable or a
    // broadcast is impossible) and a salted agg (for which AQE has no
    // runtime answer at all).
    val sess = spark
    import sess.implicits._
    // ~95% of fact rows share one hot key; a wide INCOMPRESSIBLE pad
    // column inflates the hot partition past the skew threshold below
    // (a constant pad compresses to nothing in the shuffle files, and
    // skew detection measures compressed shuffle bytes)
    val rnd = new scala.util.Random(42)
    val fact = (1 to 40000)
      .map(i => (i.toLong, if (i <= 38000) 1L else i.toLong % 97,
        rnd.alphanumeric.take(200).mkString))
      .toDF("row_id", "k", "pad")
    val dim = (0L to 96L).map(k => (k, s"v$k")).toDF("dk", "v")
    withConfs(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // force the shuffle join path (broadcast would hide the skew)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      // thresholds scaled to test data: hot partition ~8 MB vs these
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "256KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "128KB") {
      // (a) unsalted join: AQE must mark and split the skewed partition.
      // Execute THIS frame (collect, not count — count() builds its own
      // query and would leave this one's adaptive plan unfinalized),
      // then read the finalized plan.
      // keep pad in the output so column pruning can't shrink the
      // shuffled bytes the skew detection measures
      val joined = fact.join(dim, col("k") === col("dk"))
        .select("row_id", "pad", "v")
      assert(joined.collect().length === 40000)
      val jplan = joined.queryExecution.executedPlan.toString
      assert(jplan.contains("isFinalPlan=true"))
      assert(jplan.contains("skew=true") || jplan.contains("skewed"),
        s"AQE must skew-split the unsalted hot-key join:\n$jplan")
      // (b) unsalted aggregation over the same hot key: no skew marker
      // exists for the agg exchange — AQE leaves it to one reducer
      val agg = fact.groupBy("k").agg(count(lit(1)).as("c"))
      assert(agg.collect().map(r => r.getLong(1)).sum === 40000L)
      val aplan = agg.queryExecution.executedPlan.toString
      assert(!aplan.contains("skew=true") && !aplan.contains("skewed"),
        s"AQE has no skew handling for aggregation exchanges:\n$aplan")
    }
  }

  test("saltedSumCount equals direct aggregation") {
    val sess = spark
    import sess.implicits._
    val df = (1 to 500).map(i => (i.toLong, if (i <= 450) "hot" else s"k$i", i.toLong))
      .toDF("row_id", "k", "x")
    val direct = df.groupBy(col("k").as("k"))
      .agg(sum("x").as("sum_value"), count(lit(1)).as("cnt"))
      .orderBy("k").collect().toSeq
    val salted = SkewOps.saltedSumCount(df, col("k"), col("x"),
        col("row_id"), salts = 8)
      .orderBy("k").collect().toSeq
    assert(salted === direct)
  }
}
