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
    // same-type requirement on each pair: hash partitioning is not
    // value-aligned across types (Murmur3Hash(7: Int) != Murmur3Hash(7L)),
    // and Date stores days while Timestamp stores micros — either mismatch
    // would silently mis-join rather than error
    require(attr(lp, leftKey).dataType == attr(rp, rightKey).dataType,
      s"as-of join key types must match: ${attr(lp, leftKey).dataType} vs " +
        s"${attr(rp, rightKey).dataType}")
    require(attr(lp, leftTs).dataType == attr(rp, rightTs).dataType,
      s"as-of join timestamp types must match: ${attr(lp, leftTs).dataType} " +
        s"vs ${attr(rp, rightTs).dataType}")
    planToDF(spark, AsOfJoinPlan(lp, rp,
      attr(lp, leftKey), attr(rp, rightKey),
      attr(lp, leftTs), attr(rp, rightTs),
      rightTieBreak.map(attr(rp, _))))
  }
}
