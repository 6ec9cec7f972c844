package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, AttributeReference, BindReferences, BoundReference,
  Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** AS-OF JOIN as a first-class operator — rung (c) of the custom-operator
  * ladder (SURVEY §4.3): a custom `LogicalPlan` node, a planner
  * `SparkStrategy`, and a physical `SparkPlan` that EnsureRequirements
  * co-partitions and co-sorts, registered through
  * [[GraftExtensions]] / `spark.experimental.extraStrategies`.
  *
  * Semantics (LEFT ASOF): for every left row, the single right row with the
  * same key and the greatest right-time ≤ left-time; nulls on no match —
  * exactly DuckDB's `ASOF LEFT JOIN ... ON l.k = r.k AND l.t >= r.t`, which
  * is the oracle for the contract query (q110).
  *
  * Why a custom operator here, when [[graft.operators.Events.asofLastPurchase]]
  * already composes the same semantics from union + window (preference (a))?
  * The composed form materializes BOTH streams through one window: every
  * right row travels through the left side's sort, carries the left side's
  * null-padded columns, and the window's `last(_, ignoreNulls)` state runs
  * over left+right rows together. The dedicated exec:
  *  - shuffles each side once on ITS key only (same as a sort-merge join),
  *  - streams both sorted iterators with O(1) state (the last right match),
  *  - never widens rows with cross-side null columns before the join point.
  * At 100 TB the asymptotics match the SMJ it mimics — and beat the
  * union-window form by the right stream's width × sort volume. On a
  * pre-bucketed/sorted layout both exchanges vanish (EnsureRequirements
  * sees the satisfied distribution), which the union form can never do.
  *
  * Constraints (documented, checked at construction): key and time
  * expressions must be LongType attributes of the respective child — the
  * public [[AsOfJoinPlan.asofJoin]] API projects them first. Null keys or
  * times on the left join to nothing; null right keys/times never match.
  */
/** Match direction of the as-of merge. Backward: greatest right time ≤ left
  * time (the classic "last known value"). Forward: smallest right time ≥
  * left time ("next event", e.g. click → next purchase). Both stream the
  * same (key, time)-ascending sorted partitions with O(1) state — forward
  * just peeks instead of retaining, since the first in-or-after-time right
  * row under an ascending scan IS the match and may also match later left
  * rows of the same key. */
sealed trait AsOfDirection
case object AsOfBackward extends AsOfDirection
case object AsOfForward extends AsOfDirection

case class AsOfJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, leftTime: Expression,
    rightKey: Expression, rightTime: Expression,
    direction: AsOfDirection = AsOfBackward,
    tolerance: Option[Long] = None) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, leftTime: Expression,
    rightKey: Expression, rightTime: Expression,
    direction: AsOfDirection = AsOfBackward,
    tolerance: Option[Long] = None) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // Each side clusters on its own key; EnsureRequirements inserts
  // compatible hash exchanges (or none, when a bucketed layout already
  // satisfies the distribution) — the same contract SortMergeJoin uses.
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) ::
      ClusteredDistribution(rightKey :: Nil) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  // rows stream out in left order and left partitioning — declare both so
  // a downstream group-by/window on the left key reuses this exchange
  override def outputPartitioning:
      org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    left.outputPartitioning

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  private def ordinalOf(e: Expression, attrs: Seq[Attribute]): Int =
    BindReferences.bindReference(e, attrs) match {
      case BoundReference(ord, LongType, _) => ord
      case other => throw new IllegalArgumentException(
        s"as-of key/time must be a LongType child attribute, got $other")
    }

  override protected def doExecute(): RDD[InternalRow] = {
    val lkOrd = ordinalOf(leftKey, left.output)
    val ltOrd = ordinalOf(leftTime, left.output)
    val rkOrd = ordinalOf(rightKey, right.output)
    val rtOrd = ordinalOf(rightTime, right.output)
    val rightWidth = right.output.size
    val outAttrs = output
    // the projection's input schema must carry the JOIN's nullability, not
    // the right child's: a non-nullable right attribute would make codegen
    // skip the null check and read garbage zeros out of the null-padded row
    val inAttrs = left.output ++ right.output.map(_.withNullability(true))
    val lRdd = left.execute()
    val rRdd = right.execute()
    // zipPartitions pairs partitions BY INDEX, so the merge below is only
    // correct when EnsureRequirements delivered co-partitioned children.
    // Today it always does (ClusteredDistribution per side); a future
    // bucketed/cached/reused-exchange child that bypassed it would zip
    // unrelated partitions and join garbage SILENTLY — fail loudly instead.
    require(lRdd.getNumPartitions == rRdd.getNumPartitions,
      s"AsOfJoinExec requires co-partitioned children, got " +
        s"left=${lRdd.getNumPartitions} right=${rRdd.getNumPartitions} " +
        s"partitions (left partitioning: ${left.outputPartitioning}, " +
        s"right: ${right.outputPartitioning}) — EnsureRequirements should " +
        "have inserted compatible exchanges")
    val forward = direction == AsOfForward
    // None = unbounded. Times are epoch-ms-scale longs (API contract), so
    // the subtraction below cannot overflow for any real timestamp input.
    val tol = tolerance.getOrElse(Long.MaxValue)
    lRdd.zipPartitions(rRdd) { (lIter, rIter) =>
      val proj = UnsafeProjection.create(outAttrs, inAttrs)
      val joined = new JoinedRow
      val nullRight: InternalRow = new GenericInternalRow(rightWidth)
      val rBuf = rIter.buffered
      // O(1) state (backward only): the best (greatest-time) right row and
      // its time for the current key. Tolerance gates EMISSION, not state —
      // a stale match stays retained because no newer right row has
      // arrived, it just stops qualifying.
      var matchKey = 0L
      var matchTime = 0L
      var matchRow: InternalRow = null
      lIter.map { lrow =>
        if (lrow.isNullAt(lkOrd) || lrow.isNullAt(ltOrd)) {
          proj(joined(lrow, nullRight))
        } else {
          val lk = lrow.getLong(lkOrd)
          val lt = lrow.getLong(ltOrd)
          if (forward) {
            // consume right rows no current-or-future left row can match:
            // smaller key, or same key strictly before THIS left time
            // (left times ascend within the key, so they cannot match any
            // later left row either)
            var advance = true
            while (advance && rBuf.hasNext) {
              val head = rBuf.head
              if (head.isNullAt(rkOrd) || head.isNullAt(rtOrd)) rBuf.next()
              else {
                val rk = head.getLong(rkOrd)
                if (rk < lk || (rk == lk && head.getLong(rtOrd) < lt))
                  rBuf.next()
                else advance = false
              }
            }
            // the head (unconsumed — later left rows of this key may match
            // it too) is the first same-key right row at-or-after lt
            if (rBuf.hasNext && !rBuf.head.isNullAt(rkOrd) &&
                rBuf.head.getLong(rkOrd) == lk &&
                rBuf.head.getLong(rtOrd) - lt <= tol)
              proj(joined(lrow, rBuf.head))
            else proj(joined(lrow, nullRight))
          } else {
            var advance = true
            while (advance && rBuf.hasNext) {
              val head = rBuf.head
              if (head.isNullAt(rkOrd) || head.isNullAt(rtOrd)) { rBuf.next() }
              else {
                val rk = head.getLong(rkOrd)
                if (rk < lk || (rk == lk && head.getLong(rtOrd) <= lt)) {
                  // consumed rows are the shuffle reader's reused UnsafeRows —
                  // copy only the one row we retain as the running match
                  if (rk == lk) {
                    matchKey = rk
                    matchTime = head.getLong(rtOrd)
                    matchRow = rBuf.next().copy()
                  } else rBuf.next()
                } else advance = false
              }
            }
            if (matchRow != null && matchKey == lk && lt - matchTime <= tol)
              proj(joined(lrow, matchRow))
            else proj(joined(lrow, nullRight))
          }
        }
      }
    }
  }
}

/** Planner strategy mapping the logical [[AsOfJoin]] to [[AsOfJoinExec]]. */
object GraftStrategies extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, lt, rk, rt, dir, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lt, rk, rt, dir, tol) :: Nil
    case _ => Nil
  }
}

object AsOfJoinPlan {
  /** Left as-of join `left` to `right` on equal `key`: backward (default)
    * takes the greatest right `time` ≤ left `time`, forward the smallest
    * right `time` ≥ left `time`; `toleranceMs` bounds |Δtime| (a match
    * further away joins as null, like pandas `merge_asof(tolerance=...)`).
    * Column args must name LongType columns of the respective frame;
    * output = left columns ++ (nullable) right columns. The two frames
    * must not share column names (alias beforehand). Forward-direction
    * determinism note: among right rows tied on (key, time) the merge
    * takes the first in partition order — pre-reduce the right side to
    * unique (key, time) when tied rows differ in other columns. */
  def asofJoin(spark: SparkSession, left: DataFrame, right: DataFrame,
               leftKey: String, leftTime: String,
               rightKey: String, rightTime: String,
               direction: AsOfDirection = AsOfBackward,
               toleranceMs: Option[Long] = None): DataFrame = {
    def attr(df: DataFrame, name: String): Expression =
      GraftColumnBridge.expression(df.col(name)) match {
        case a: AttributeReference => a
        case other => throw new IllegalArgumentException(
          s"$name did not resolve to an attribute: $other")
      }
    // shared attribute exprIds (same DataFrame on both sides, or un-aliased
    // projections of one plan) would duplicate attributes in the output and
    // UnsafeProjection would silently bind right columns to the left
    // occurrence — wrong values, no error. Fail loudly instead.
    val shared = left.queryExecution.analyzed.outputSet
      .intersect(right.queryExecution.analyzed.outputSet)
    require(shared.isEmpty,
      s"as-of join sides share attributes ${shared.toSeq.map(_.name).mkString(", ")} — " +
        "alias the right side (toDF/select ... as) before joining")
    GraftColumnBridge.ofRows(spark, AsOfJoin(
      left.queryExecution.analyzed, right.queryExecution.analyzed,
      attr(left, leftKey), attr(left, leftTime),
      attr(right, rightKey), attr(right, rightTime),
      direction, toleranceMs))
  }
}
