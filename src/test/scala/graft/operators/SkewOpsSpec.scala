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
