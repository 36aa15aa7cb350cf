package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join operator (SURVEY.md §2b q11's semantics as a
  * first-class plan node): for every left row, attach the latest right
  * row with the same key and `rightTs <= leftTs`, or nulls.
  *
  * Physical strategy is a co-partitioned sort-merge: both children are
  * hash-clustered on the key (ClusteredDistribution with a pinned
  * partition count so the two shuffles are identical) and sorted by
  * (key, ts [, tieBreak...]); each partition pair then merges in one
  * linear pass carrying the last-seen matching right row — no windowing
  * state, no range-join blowup, O(n log n) in the shuffle sort only.
  * This is preference-order (c) from the build contract: LogicalPlan +
  * Strategy + SparkPlan, injected via extraStrategies / extensions. */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    rightTieBreak: Seq[Expression]) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lts, rts, tie) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts, tie) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    rightTieBreak: Seq[Expression]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // pin the partition count so both exchanges produce identical
  // HashPartitioning and zipPartitions sees aligned partition pairs
  override def requiredChildDistribution: Seq[Distribution] = {
    val n = Some(conf.numShufflePartitions)
    ClusteredDistribution(Seq(leftKey), requiredNumPartitions = n) ::
    ClusteredDistribution(Seq(rightKey), requiredNumPartitions = n) :: Nil
  }

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)) ::
    (Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)) ++
      rightTieBreak.map(SortOrder(_, Ascending))) :: Nil

  // preserve the properties the exchanges+sorts just established, so a
  // downstream groupBy/join on the same key doesn't re-shuffle
  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val lkB = BindReferences.bindReference(leftKey, left.output)
    val ltsB = BindReferences.bindReference(leftTs, left.output)
    val rkB = BindReferences.bindReference(rightKey, right.output)
    val rtsB = BindReferences.bindReference(rightTs, right.output)
    val rightWidth = right.output.size
    val outAttrs = output
    // local, not a member method: a member reference would drag `this`
    // (the whole plan tree) into every task closure
    def tsMicros(v: Any): Long = v.asInstanceOf[Number].longValue()

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val rBuf = rIter.buffered
      val nullRight = new GenericInternalRow(rightWidth)
      val joined = new JoinedRow
      val toUnsafe = UnsafeProjection.create(outAttrs, outAttrs)
      var lastMatch: InternalRow = null
      var lastMatchKey: Long = 0L
      var haveMatch = false

      lIter.map { lRow =>
        val kv = lkB.eval(lRow)
        val tv = ltsB.eval(lRow)
        if (kv == null || tv == null) {
          // SQL join semantics: null keys/timestamps never match
          toUnsafe(joined(lRow, nullRight))
        } else {
          val k = kv.asInstanceOf[Number].longValue()
          val t = tsMicros(tv)
          if (haveMatch && lastMatchKey != k) { haveMatch = false; lastMatch = null }
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val head = rBuf.head
            val rkv = rkB.eval(head)
            val rtv = rtsB.eval(head)
            if (rkv == null || rtv == null) {
              rBuf.next() // null-keyed right rows (sorted first) can't match
            } else {
              val rk = rkv.asInstanceOf[Number].longValue()
              val rt = tsMicros(rtv)
              if (rk < k || (rk == k && rt <= t)) {
                val consumed = rBuf.next()
                if (rk == k) {
                  lastMatch = consumed.copy()
                  lastMatchKey = k
                  haveMatch = true
                }
              } else advancing = false
            }
          }
          val r = if (haveMatch && lastMatchKey == k) lastMatch else nullRight
          toUnsafe(joined(lRow, r))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
