package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalable band (range) join: all pairs with |lVal − rVal| ≤ delta.
  *
  * The naive theta formulation (q10) plans as BroadcastNestedLoopJoin —
  * an O(n·m) compare matrix, viable only while one side broadcasts. This
  * operator bucketizes both sides on `floor(value / (2·delta))` and
  * equi-joins each left row against buckets {b−1, b, b+1}; a qualifying
  * pair's quotients differ by at most delta/(2·delta) = 0.5, so its
  * buckets differ by at most 1 even after floating-point division error
  * (0.5 + ulps < 1 — bucket width 2·delta, not delta, buys exactly this
  * robustness margin). The residual predicate restores exactness, and
  * each qualifying pair matches exactly once (the three probe values are
  * distinct, the build bucket is single-valued), so no dedup pass is
  * needed. Cost: 3× fan-out of the probe side through a hash join —
  * the 100 TB shape — instead of the nested-loop compare matrix. Null
  * band values never match, like the theta form. */
object BandJoin {

  /** Above this quotient magnitude a double division's ulp reaches 0.25
    * and the ±1 probe completeness proof no longer holds — fail loudly
    * per row instead of silently dropping pairs. */
  private val MaxQuotient = math.pow(2, 50)

  def bandJoin(left: DataFrame, right: DataFrame,
      lVal: Column, rVal: Column, delta: Double): DataFrame = {
    require(delta > 0, s"band width must be positive, got $delta")
    val helpers = Seq("__band_probe", "__band_bucket", "__band_lv", "__band_rv")
    helpers.foreach { c =>
      require(!left.columns.contains(c) && !right.columns.contains(c),
        s"inputs must not already contain a $c column")
    }
    val width = 2 * delta
    // Materialize the band values as side-specific helper columns FIRST:
    // the join condition then references only columns that exist on one
    // side, so self-band-joins and inputs sharing the value column's name
    // resolve unambiguously.
    def bucket(q: Column): Column =
      when(abs(q) > MaxQuotient, expr(
        "raise_error('bandJoin: |value|/(2*delta) exceeds 2^50; " +
          "bucketization would be lossy — use a larger delta or " +
          "rescale the band column')").cast("long"))
        .otherwise(floor(q).cast("long"))
    val lb = bucket(col("__band_lv") / width)
    val probe = left.withColumn("__band_lv", lVal)
      .withColumn("__band_probe", explode(array(lb - 1, lb, lb + 1)))
    val build = right.withColumn("__band_rv", rVal)
      .withColumn("__band_bucket", bucket(col("__band_rv") / width))
    // Residual in the abs form — the ONLY form used engine-wide (q10's
    // theta predicate, the shared DuckDB oracle, both properties). The
    // subtract form `rv >= lv − δ && rv <= lv + δ` is NOT IEEE-equivalent:
    // at exact band boundaries (lv=−3.2, rv=1.8, δ=5) abs(lv−rv) rounds
    // to exactly δ while lv+δ rounds below rv, and the subtract form is
    // asymmetric in a self-join. abs() is symmetric by construction and
    // DuckDB evaluates the identical subtraction+abs, so oracle parity
    // holds bit-for-bit.
    probe.join(build,
        col("__band_probe") === col("__band_bucket") &&
        abs(col("__band_lv") - col("__band_rv")) <= delta)
      .drop(helpers: _*)
  }
}
