// Hosted under org.apache.spark.sql: the operator is a genuine Catalyst
// citizen — a logical node, a planner Strategy and a physical SparkPlan —
// and the Dataset constructor it needs (`classic.Dataset.ofRows`) is
// private[sql]. This is the "whole-operator" extension rung: where the
// binned rewrite (graft.plans.BinnedJoinRewrite) re-expresses a range
// join through EXISTING operators (explode + equi-join), this node owns
// its physical execution outright — one shuffle and one sort per side,
// then a partition-local interval sweep with no candidate blowup at all.
package org.apache.spark.sql.graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics

/** Logical interval-overlap join: rows of `left` carrying interval
  * `[lStart, lEnd]` paired with rows of `right` carrying `[rStart, rEnd]`
  * when their equality keys match and the intervals overlap under the
  * given endpoint closedness. Points are degenerate intervals
  * (`lStart == lEnd`). Inner join; `output = left.output ++ right.output`.
  */
case class IntervalSweepJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    lStart: Expression, lEnd: Expression,
    rStart: Expression, rEnd: Expression,
    lClosedStart: Boolean, lClosedEnd: Boolean,
    rClosedStart: Boolean, rClosedEnd: Boolean,
    matchNullKeys: Boolean = false) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): IntervalSweepJoin =
    copy(left = newLeft, right = newRight)
}

/** `Dataset.ofRows` is private[sql]; this shim lets the public
  * `graft.joins.SweepJoin` wrapper materialize a DataFrame over the
  * custom logical node.
  */
object SweepPlanBuilder {
  def ofRows(spark: org.apache.spark.sql.classic.SparkSession,
             plan: LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(spark, plan)
}

/** Plans [[IntervalSweepJoin]] as [[IntervalSweepJoinExec]]. Install via
  * `spark.experimental.extraStrategies` (the public API wrapper does) or
  * `GraftExtensions`.
  */
object IntervalSweepStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: IntervalSweepJoin =>
      IntervalSweepJoinExec(planLater(j.left), planLater(j.right),
        j.leftKeys, j.rightKeys, j.lStart, j.lEnd, j.rStart, j.rEnd,
        j.lClosedStart, j.lClosedEnd, j.rClosedStart, j.rClosedEnd,
        j.matchNullKeys) :: Nil
    case _ => Nil
  }
}

/** Partition-local sorted interval sweep.
  *
  * Physical contract (enforced through `requiredChildDistribution` /
  * `requiredChildOrdering`, so EnsureRequirements inserts exactly the
  * exchanges and sorts needed and AQE sizes them):
  *   - both sides hash-clustered on their equality keys (keyless form
  *     degenerates to a single partition — use keys at scale);
  *   - both sides sorted by (keys…, interval start) within partitions.
  *
  * The sweep walks the two sorted streams once: right rows enter an
  * active buffer while their start can still precede the current left
  * end, and are evicted once their end falls before the current left
  * start — which is monotone, because left starts ascend. Per-key cost
  * is O(|L| + |R| + output + |L|·active), where `active` is bounded by
  * the interval-overlap density, NOT by bin width or candidate-pair
  * counts: dense same-key ranges that make the binned equi-join explode
  * (every interval × every touched bin) cost this operator nothing
  * extra. No broadcast, no bin tuning, no candidate materialization.
  *
  * Rows with null endpoints never match and are dropped on entry. Null
  * keys follow `matchNullKeys`: false = SQL `===` inner-join semantics
  * (null-keyed rows dropped); true = null-safe `<=>` semantics (null
  * keys match each other — hash partitioning routes all null keys to
  * one partition and the sort groups them, so the sweep handles them
  * like any other key value).
  */
case class IntervalSweepJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    lStart: Expression, lEnd: Expression,
    rStart: Expression, rEnd: Expression,
    lClosedStart: Boolean, lClosedEnd: Boolean,
    rClosedStart: Boolean, rClosedEnd: Boolean,
    matchNullKeys: Boolean = false) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    if (leftKeys.isEmpty) AllTuples :: AllTuples :: Nil
    else ClusteredDistribution(leftKeys) ::
      ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(lStart, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rStart, Ascending))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): IntervalSweepJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val (lsE, leE, rsE, reE) = (lStart, lEnd, rStart, rEnd)
    val (lcS, lcE, rcS, rcE) = (lClosedStart, lClosedEnd, rClosedStart, rClosedEnd)
    val nullSafe = matchNullKeys
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeyExprs.map(_.dataType))
      val tOrd = TypeUtils.getInterpretedOrdering(lsE.dataType)
        .asInstanceOf[Ordering[Any]]
      val lsB = BindReferences.bindReference(lsE, lOut)
      val leB = BindReferences.bindReference(leE, lOut)
      val rsB = BindReferences.bindReference(rsE, rOut)
      val reB = BindReferences.bindReference(reE, rOut)
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow

      // right lookahead: (key copy, rs, re, row copy); rows are copied
      // once on entry because the child iterator reuses its UnsafeRow
      final class REntry(val key: UnsafeRow, val rs: Any, val re: Any,
                         val row: InternalRow)
      var rLook: REntry = null
      def advanceRight(): Unit = {
        rLook = null
        while (rLook == null && rIter.hasNext) {
          val r = rIter.next()
          val rs = rsB.eval(r)
          val re = reB.eval(r)
          val k = rKeyProj(r)
          if (rs != null && re != null && (nullSafe || !k.anyNull)) {
            rLook = new REntry(k.copy(), rs, re, r.copy())
          }
        }
      }
      advanceRight()

      val active = new ArrayBuffer[REntry]
      var curKey: UnsafeRow = null

      def overlaps(ls: Any, le: Any, e: REntry): Boolean = {
        val c1 = tOrd.compare(e.rs.asInstanceOf[Any], le)
        val startOk = c1 < 0 || (c1 == 0 && lcE && rcS)
        if (!startOk) return false
        val c2 = tOrd.compare(ls, e.re.asInstanceOf[Any])
        c2 < 0 || (c2 == 0 && lcS && rcE)
      }

      lIter.flatMap { l =>
        val ls = lsB.eval(l)
        val le = leB.eval(l)
        val lk = lKeyProj(l)
        if (ls == null || le == null || (!nullSafe && lk.anyNull)) Iterator.empty
        else {
          if (curKey == null || keyOrd.compare(curKey, lk) != 0) {
            active.clear()
            curKey = lk.copy()
          }
          while (rLook != null && keyOrd.compare(rLook.key, curKey) < 0) {
            advanceRight()
          }
          while (rLook != null && keyOrd.compare(rLook.key, curKey) == 0 &&
              tOrd.compare(rLook.rs, le) <= 0) {
            active += rLook
            advanceRight()
          }
          // monotone eviction: left starts ascend within the key, so an
          // entry whose end precedes this start can never match again
          if (active.nonEmpty) {
            active.filterInPlace(e => tOrd.compare(e.re, ls) >= 0)
          }
          active.iterator.filter(e => overlaps(ls, le, e)).map { e =>
            numOutputRows += 1
            resultProj(joined(l, e.row))
          }
        }
      }
    }
  }
}
