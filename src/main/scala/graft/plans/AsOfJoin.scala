package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native AS-OF join — the full custom-operator stack (logical node →
  * planner strategy → physical operator), the extension path for
  * whole-operator semantics Spark's built-ins can't express directly.
  *
  * Semantics (pandas merge_asof / DuckDB ASOF LEFT JOIN ≥): for every
  * left row, attach the LATEST right row with equal keys and right
  * time ≤ left time; no match → right columns NULL. NULL keys and
  * NULL times never match.
  *
  * The compositional form ([[graft.ops.Joins.asofJoin]], q57) unions
  * both sides through one window pass — already a single shuffle. What
  * the physical operator adds is the textbook merge plan: both sides
  * hash-cluster on the keys and sort by (keys, time) — requirements
  * Spark's EnsureRequirements satisfies with exactly one exchange +
  * sort per side — and then a ZERO-allocation per-partition merge scan
  * joins them in one pass holding ONE buffered right row, instead of
  * carrying a payload struct through window state. Both inputs can be
  * fact-scale; peak memory is O(1) per partition beyond the sorts.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                        leftTime: Expression, rightTime: Expression)
  extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] into [[AsOfJoinExec]]; injected via
  * `GraftExtensions` (builder path) or `experimental.extraStrategies`
  * (post-hoc path).
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                        leftTime: Expression, rightTime: Expression)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // SortMergeJoin's contract: cluster both children on their keys
  // (EnsureRequirements co-partitions them), sort by (keys, time)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending))
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending)

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lk = leftKeys; val rk = rightKeys
    val lt = leftTime; val rt = rightTime
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (li, ri) =>
      val lKeyProj = UnsafeProjection.create(lk, lOut)
      val rKeyProj = UnsafeProjection.create(rk, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lt), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rt), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      // bind right columns as NULLABLE — the unmatched case feeds an
      // all-null row, and a non-nullable binding would skip the null
      // check and read 0/garbage from the null slots
      val outProj = UnsafeProjection.create(outAttrs,
        lOut ++ rOut.map(_.withNullability(true)))
      val joiner = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.length)

      // the single buffered right row (copied: it outlives its
      // iterator slot), its key, and its time
      var rRow: InternalRow = null
      var rKey: InternalRow = null
      var rTime: InternalRow = null
      // last right row that satisfied (key equal, time <= left time)
      var lastMatch: InternalRow = null
      var lastMatchKey: InternalRow = null

      def advance(): Unit =
        if (ri.hasNext) {
          rRow = ri.next().copy()
          rKey = rKeyProj(rRow).copy()
          rTime = rTimeProj(rRow).copy()
        } else { rRow = null; rKey = null; rTime = null }
      advance()

      li.map { l0 =>
        // projection buffers are only overwritten by the NEXT left row,
        // so no copies are needed on the left path
        val lKey = lKeyProj(l0)
        val lTime = lTimeProj(l0)
        if (!lKey.anyNull) {
          // discard right groups that sort before this key
          while (rRow != null && keyOrd.compare(rKey, lKey) < 0) advance()
          // absorb this key's right rows up to the left time; a NULL
          // right time sorts first and is skipped without recording
          if (!lTime.isNullAt(0)) {
            while (rRow != null && keyOrd.compare(rKey, lKey) == 0 &&
                timeOrd.compare(rTime, lTime) <= 0) {
              if (!rTime.isNullAt(0)) { lastMatch = rRow; lastMatchKey = rKey }
              advance()
            }
          }
        }
        val matched = lastMatch != null && !lKey.anyNull &&
          keyOrd.compare(lastMatchKey, lKey) == 0
        outProj(joiner(l0, if (matched) lastMatch else nullRight))
      }
    }
  }
}
