package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.graftbridge.{analyzedPlan, planToDF}
import graft.plans.{AsOfJoinPlan, AsOfJoinStrategy}

/** Dataset-level entry point for the native as-of join
  * ([[graft.plans.AsOfJoinPlan]]). Column names must be disjoint between
  * the two sides (rename the right side first — as-of joins almost always
  * want prefixed right columns anyway). */
object AsOfJoin {

  def asof(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      rightTieBreak: Seq[String] = Nil): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    val lp = analyzedPlan(left)
    val rp = analyzedPlan(right)
    val overlap = lp.output.map(_.name).toSet
      .intersect(rp.output.map(_.name).toSet)
    require(overlap.isEmpty,
      s"as-of join requires disjoint column names; overlapping: $overlap")
    def attr(p: LogicalPlan, n: String) =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"column $n not in [${p.output.map(_.name).mkString(", ")}]"))
    // the physical merge compares keys/timestamps as longs
    import org.apache.spark.sql.types._
    val mergeComparable: Set[DataType] = Set(ByteType, ShortType,
      IntegerType, LongType, DateType, TimestampType, TimestampNTZType)
    Seq(attr(lp, leftKey), attr(rp, rightKey), attr(lp, leftTs),
      attr(rp, rightTs)).foreach { a =>
      require(mergeComparable.contains(a.dataType),
        s"as-of join requires integral/timestamp columns; ${a.name} is ${a.dataType}")
    }
    planToDF(spark, AsOfJoinPlan(lp, rp,
      attr(lp, leftKey), attr(rp, rightKey),
      attr(lp, leftTs), attr(rp, rightTs),
      rightTieBreak.map(attr(rp, _))))
  }
}
