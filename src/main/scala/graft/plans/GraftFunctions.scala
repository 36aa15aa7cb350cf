package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration for the graft expressions, two ways:
  *
  *  - [[GraftFunctions.register]]: imperative, on an existing session —
  *    `graft_poly_hash(s [, base])` and `graft_seq_dot(a, b)` become
  *    callable from `spark.sql(...)`.
  *  - [[GraftExtensions]]: declarative, via
  *    `spark.sql.extensions=graft.plans.GraftExtensions` at session build
  *    time — the deployment path for clusters where user code can't touch
  *    session internals. */
object GraftFunctions {

  private def polyBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(s) => PolyHash(s, 131, 2147483647L)
    case Seq(s, b) =>
      // the base must be a compile-time constant — eval() on a column
      // reference here would throw an opaque internal error
      val base = b match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Number, _)
            if v != null => v.intValue()
        case _ => throw new IllegalArgumentException(
          "graft_poly_hash base must be a non-null integer literal")
      }
      PolyHash(s, base, 2147483647L)
    case _ => throw new IllegalArgumentException(
      "graft_poly_hash(str[, base]) takes 1 or 2 arguments")
  }

  private def dotBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(a, b) => SeqDotProduct(a, b)
    case _ => throw new IllegalArgumentException(
      "graft_seq_dot(a, b) takes 2 arguments")
  }

  private def intersectBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(a, b) => SortedIntersectCount(a, b)
    case _ => throw new IllegalArgumentException(
      "graft_sorted_intersect(a, b) takes 2 arguments")
  }

  private def zipEqualBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(a, b) => ZipEqualCount(a, b)
    case _ => throw new IllegalArgumentException(
      "graft_zip_equal(a, b) takes 2 arguments")
  }

  private def intersectMinBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(a, b, al) => SortedIntersectMin(a, b, al)
    case _ => throw new IllegalArgumentException(
      "graft_sorted_intersect_min(a, b, alpha) takes 3 arguments")
  }

  private def mortonBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(x, y) => MortonCode(x, y)
    case _ => throw new IllegalArgumentException(
      "graft_morton(x, y) takes 2 arguments")
  }

  private def dotLongBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(a, b) => SeqDotLong(a, b)
    case _ => throw new IllegalArgumentException(
      "graft_seq_dot_long(a, b) takes 2 arguments")
  }

  private def bigramsBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(s) => WordBigrams(s)
    case _ => throw new IllegalArgumentException(
      "graft_bigrams(str) takes 1 argument")
  }

  /** k (capacity) must be a compile-time INTEGRAL literal — the same
    * constraint Spark's own approx aggregates place on their accuracy
    * argument. Fractional literals are rejected, not truncated: a user
    * writing graft_topk(v, id, 2.9) should get an error, not k = 2. */
  private def litInt(e: Expression, fn: String): Int = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    e match {
      case Literal(v: Number, ByteType | ShortType | IntegerType | LongType)
          if v != null =>
        // range-check on the LONG value before narrowing: intValue() wraps
        // silently, so an out-of-range BIGINT literal (k = 2^32 + 2) would
        // otherwise become k = 2 — truncation, which this contract rejects
        val lv = v.longValue()
        if (lv < 1L || lv > Int.MaxValue.toLong)
          throw new IllegalArgumentException(
            s"$fn: capacity/k must be in [1, ${Int.MaxValue}], got $lv")
        lv.toInt
      case _ => throw new IllegalArgumentException(
        s"$fn: capacity/k must be a non-null INTEGRAL literal")
    }
  }

  private def misraGriesBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(item, k) =>
      MisraGriesAgg(item, litInt(k, "graft_misra_gries"))
        .toAggregateExpression()
    case _ => throw new IllegalArgumentException(
      "graft_misra_gries(item, k) takes 2 arguments")
  }

  private def topkBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(v, id, k) =>
      TopKAgg(v, id, litInt(k, "graft_topk")).toAggregateExpression()
    case _ => throw new IllegalArgumentException(
      "graft_topk(value, id, k) takes 3 arguments")
  }

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_poly_hash"),
      new ExpressionInfo(classOf[PolyHash].getName, "graft_poly_hash"),
      polyBuilder),
    (FunctionIdentifier("graft_seq_dot"),
      new ExpressionInfo(classOf[SeqDotProduct].getName, "graft_seq_dot"),
      dotBuilder),
    (FunctionIdentifier("graft_sorted_intersect"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName,
        "graft_sorted_intersect"),
      intersectBuilder),
    (FunctionIdentifier("graft_zip_equal"),
      new ExpressionInfo(classOf[ZipEqualCount].getName, "graft_zip_equal"),
      zipEqualBuilder),
    (FunctionIdentifier("graft_sorted_intersect_min"),
      new ExpressionInfo(classOf[SortedIntersectMin].getName,
        "graft_sorted_intersect_min"),
      intersectMinBuilder),
    (FunctionIdentifier("graft_morton"),
      new ExpressionInfo(classOf[MortonCode].getName, "graft_morton"),
      mortonBuilder),
    (FunctionIdentifier("graft_seq_dot_long"),
      new ExpressionInfo(classOf[SeqDotLong].getName, "graft_seq_dot_long"),
      dotLongBuilder),
    (FunctionIdentifier("graft_bigrams"),
      new ExpressionInfo(classOf[WordBigrams].getName, "graft_bigrams"),
      bigramsBuilder),
    (FunctionIdentifier("graft_misra_gries"),
      new ExpressionInfo(classOf[MisraGriesAgg].getName, "graft_misra_gries"),
      misraGriesBuilder),
    (FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[TopKAgg].getName, "graft_topk"),
      topkBuilder))

  /** Register on a live session (temp functions, session-scoped). */
  def register(spark: SparkSession): Unit = functions.foreach {
    case (ident, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(ident.funcName, builder, "built-in")
  }
}

/** `spark.sql.extensions` entry point: scalar functions + the native
  * as-of join planner strategy. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.functions.foreach(ext.injectFunction)
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
  }
}
