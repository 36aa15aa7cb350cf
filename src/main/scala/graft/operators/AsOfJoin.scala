package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.functions._
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

  /** Hot-key-safe as-of join: identical semantics to [[asof]], with each
    * key's work spread across up to `slices` tasks.
    *
    * [[asof]] clusters BOTH sides on the key, so one hot key's entire
    * timeline lands on ONE partition (the documented single-partition
    * bound — AQE cannot split a custom exec node). This variant salts by
    * TIME: the left timeline is cut into `slices` quantile slices, both
    * sides join on the composite (key, slice), and — the as-of-specific
    * part — each key's latest right row per slice is carried forward into
    * every later slice, so a left row whose true match lives in an
    * earlier slice still finds it. The carry frame is aggregated
    * (one row per key × slice), so its size is metadata-scale next to
    * the data; the hot key's rows spread over up to `slices` reducers.
    *
    * Exactness: within composite key (k, j) the candidates are exactly
    * k's right rows in slice j plus k's latest right row before slice j
    * — the argmax over ts ≤ t is unchanged. Equality with [[asof]] is
    * property-tested (AsOfJoinSpec). For a deterministic result,
    * `rightTieBreak` must make (ts, tieBreak) unique per key — the same
    * requirement the base operator has.
    *
    * Requirements beyond [[asof]]: ts columns must be TIMESTAMP or
    * integral (quantile slicing needs a numeric axis), and
    * |key| * slices must stay inside int64 (ANSI mode fails loudly on
    * overflow rather than mis-joining). Boundary estimation runs one
    * lightweight quantile job on the left ts column at build time. */
  def asofSalted(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      rightTieBreak: Seq[String] = Nil,
      slices: Int = 8): DataFrame = {
    // cap well below codegen limits: slice assignment is a chained
    // when/add expression, O(slices) nodes evaluated per row — fine for
    // the realistic 8–64 range (a hot key rarely needs more parallelism
    // than that), pathological at thousands (64KB generated-method limit,
    // linear per-row cost). A width_bucket-style binary search would
    // lift the cap if a use case ever demands it.
    require(slices >= 2 && slices <= 128,
      s"slices must be in [2, 128], got $slices")
    import org.apache.spark.sql.types._
    def asLong(df: DataFrame, name: String): Column =
      df.schema(name).dataType match {
        case TimestampType => unix_micros(col(name))
        case ByteType | ShortType | IntegerType | LongType =>
          col(name).cast("long")
        case dt => throw new IllegalArgumentException(
          s"asofSalted needs a TIMESTAMP or integral ts axis; $name is $dt")
      }
    // slice boundaries from left-ts quantiles: row-balanced even when
    // events cluster in time. Exactness never depends on the boundary
    // values — only the (identical) slice assignment on both sides does.
    val probs = (1 until slices).map(_.toDouble / slices).toArray
    val bounds = left.select(asLong(left, leftTs).cast("double").as("__t"))
      .na.drop().stat.approxQuantile("__t", probs, 0.001)
      .map(_.toLong).distinct.sorted
    val nSlices = bounds.length + 1 // collapsed quantiles shrink the fan-out
    def sliceOf(ts: Column): Column =
      bounds.foldLeft(lit(0)) { (acc, b) =>
        acc + when(ts > lit(b), 1).otherwise(0)
      }
    val l2 = left.withColumn("__slice_l", sliceOf(asLong(left, leftTs)))
      .withColumn("__skey_l",
        col(leftKey).cast("long") * nSlices + col("__slice_l"))
    val r2 = right.withColumn("__slice_r", sliceOf(asLong(right, rightTs)))
    // carry: per (key, slice) keep the latest right row (max over a
    // struct ordered ts-first, then tie-breaks, then the payload), then
    // replicate each slice's winner into every LATER slice and take the
    // per-target-slice max — one aggregated row per (key, target slice).
    val w = struct(
      (col(rightTs) +: rightTieBreak.map(col)) :+
        struct(right.columns.toIndexedSeq.map(col): _*).as("row"): _*)
    val lastPer = r2.groupBy(col(rightKey), col("__slice_r"))
      .agg(max(w).as("__w"))
    val carry = lastPer.filter(col("__slice_r") < nSlices - 1)
      .withColumn("__slice_t",
        explode(sequence(col("__slice_r") + 1, lit(nSlices - 1))))
      .groupBy(col(rightKey).as("__ck"), col("__slice_t"))
      .agg(max("__w").as("__w"))
      .selectExpr("__slice_t AS __slice_r", "__w.row.*")
    val r3 = r2.unionByName(carry.select(r2.columns.toIndexedSeq.map(col): _*))
      .withColumn("__skey_r",
        col(rightKey).cast("long") * nSlices + col("__slice_r"))
    asof(l2, r3, "__skey_l", "__skey_r", leftTs, rightTs, rightTieBreak)
      .drop("__slice_l", "__skey_l", "__slice_r", "__skey_r")
  }
}
