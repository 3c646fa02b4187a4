// Hosted under org.apache.spark.sql for the same reason as
// IntervalSweep.scala: the dispatch needs `classic.Dataset.ofRows`
// (via SweepPlanBuilder) and `SparkPlan.session`.
package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan}
import org.apache.spark.sql.functions.{col, lit, not}

import graft.core.{IntervalSpec, Intervals}

/** Deferred stats-driven skew dispatch for rule-planned sweep joins.
  *
  * [[graft.plans.SweepJoinRewrite]] turns a declarative keyed range join
  * into the custom sweep — but the PLAIN sweep hash-clusters on the
  * keys, so a declarative join on a skewed key gets the single-straggler
  * plan unless the user calls [[graft.joins.SaltedSweepJoin.auto]]
  * directly. A Catalyst rule cannot make the routing decision itself
  * (rules must not launch jobs, and the stats that decide hot keys ARE a
  * job), so the rule rewrites to THIS logical node instead: the decision
  * is deferred to `doExecute`, where running jobs is legitimate (Spark's
  * own RangePartitioner samples its child inside execution the same
  * way). At execution the dispatch runs `SaltedSweepJoin.auto` — one
  * both-sides stats pass, hot keys time-sliced, no hot keys ≡ the plain
  * sweep.
  *
  * '''Semantics guard.''' The operator API validity-filters EMPTY
  * intervals on ingress (`start > stop` under the closedness, or NaN
  * endpoints) — the graft interval convention — while the raw sweep
  * exec evaluates the join conjuncts exactly as written, and an inverted
  * "interval" CAN satisfy them (`ls=5, le=3` matches `[2, 10]`). A
  * rule-planned join must be row-identical to the join the user wrote,
  * so the dispatch first runs one cheap existence probe (union of both
  * sides, `limit(1)`): if any row has a non-null-endpoint empty
  * interval, it falls back to the raw [[IntervalSweepJoin]] node —
  * today's exact plan. Rows with NULL endpoints never match on either
  * path, so they cannot flip the decision. The probe + stats pass cost
  * two extra scans of the inputs; the joins this rule targets are the
  * ones where a single straggling task dwarfs that.
  */
case class AutoSaltedSweepJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    lStart: Expression, lEnd: Expression,
    rStart: Expression, rEnd: Expression,
    lClosedStart: Boolean, lClosedEnd: Boolean,
    rClosedStart: Boolean, rClosedEnd: Boolean,
    matchNullKeys: Boolean = false,
    /** When defined, the subset (in original order) of
      * `left.output ++ right.output` the PARENT plan actually consumes —
      * folded in by [[graft.plans.SweepJoinRewrite]]'s pruning pass
      * (injected rules run after Catalyst's ColumnPruning batch, so
      * nothing else ever prunes this node). The dispatch exec projects
      * the nested execution down to this set BEFORE rows cross the
      * leaf-exec boundary: a wide join feeding a 2-column aggregate
      * ships 2 columns per match row, not the join's full width.
      * `Some(Nil)` is legal (a bare `count(1)` parent needs no columns
      * at all). */
    requiredOutput: Option[Seq[Attribute]] = None) extends BinaryNode {
  override def output: Seq[Attribute] =
    requiredOutput.getOrElse(left.output ++ right.output)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AutoSaltedSweepJoin =
    copy(left = newLeft, right = newRight)

  /** The conjunct-exact raw sweep over the same children/flags — the
    * dispatch's fallback node (one conversion site instead of
    * re-listing all 13 fields). */
  def toRawSweep: IntervalSweepJoin =
    IntervalSweepJoin(left, right, leftKeys, rightKeys,
      lStart, lEnd, rStart, rEnd,
      lClosedStart, lClosedEnd, rClosedStart, rClosedEnd, matchNullKeys)

  /** The right side is a CLOSED point probe (rStart ≡ rEnd): no right
    * row is ever empty under the interval convention, and a left row
    * the operator ingress filter drops (start > stop, or start = stop
    * under a non-closed flag) admits no point between its bounds — the
    * validity probe is provably redundant... for TOTAL orders. Under
    * Spark's float/double ordering NaN sorts above +∞, so a left
    * interval `[5.0, NaN]` is ingress-dropped (NaN endpoint ⇒ empty by
    * the interval convention) yet matches every point ≥ 5 in the raw
    * conjuncts (`p <= NaN` is true). The dispatch therefore still runs
    * a NaN-only probe on the LEFT side when endpoints are floating —
    * left-only suffices: a NaN right point `p` satisfies `p <= le`
    * only when `le` is itself NaN, so every divergent row pair
    * involves a NaN LEFT endpoint. */
  def closedPointProbe: Boolean =
    rClosedStart && rClosedEnd && rStart.semanticEquals(rEnd)

  /** Whether a left endpoint type admits NaN (the one value breaking
    * [[closedPointProbe]]'s redundancy proof — see its scaladoc). */
  def leftEndpointsFloating: Boolean =
    Seq(lStart.dataType, lEnd.dataType).exists(t =>
      t == org.apache.spark.sql.types.DoubleType ||
        t == org.apache.spark.sql.types.FloatType)
}

/** Physical dispatch for [[AutoSaltedSweepJoin]]. A leaf exec that owns
  * the two LOGICAL children: `doExecute` materializes them as
  * DataFrames, probes validity, and executes either the auto-salted
  * operator chain or the raw sweep node — both nested query executions
  * whose output ordinals match this node's `output` exactly.
  *
  * `join` is `@transient` (the `FileSourceScanExec` idiom): when this
  * node feeds a whole-stage-codegen'd parent (e.g. HashAggregateExec
  * puts ITSELF — and so its child subtree — into the generated code's
  * `references` array), the plan tree is java-serialized into every
  * task, and the logical children hold a non-serializable
  * `InMemoryFileIndex`. `doExecute` runs driver-side before any task
  * serialization; executors never touch the field. `output` is captured
  * eagerly for the same reason.
  */
case class AutoSaltedSweepDispatchExec(@transient join: AutoSaltedSweepJoin)
    extends LeafExecNode {

  override val output: Seq[Attribute] = join.output

  protected override def doExecute(): RDD[InternalRow] = {
    val spark = session

    // rename passthrough columns to synthetic names
    // (SaltedSweepJoin.auto requires disjoint names across sides, and
    // the originals may collide). Key/endpoint expressions that are
    // BARE column references reuse the passthrough alias instead of
    // shipping a duplicate column — the join's shuffle carries each
    // referenced column once, not twice (measured: the duplicating
    // form cost ~40% extra wall clock on a 472M-match sf1 join);
    // computed expressions still get their own alias. Columns neither
    // in this node's (possibly pruned) output nor referenced by a
    // key/endpoint never enter the nested execution at all — the
    // sweep's shuffle carries the minimal width, not the child's.
    val neededIds: Set[Long] =
      (output ++
        (join.leftKeys ++ join.rightKeys ++
          Seq(join.lStart, join.lEnd, join.rStart, join.rEnd))
          .flatMap(_.references)).map(_.exprId.id).toSet
    def proj(child: LogicalPlan, keys: Seq[Expression],
             s: Expression, e: Expression, p: String)
        : (LogicalPlan, Seq[String], String, String) = {
      val passthrough = child.output.zipWithIndex.collect {
        case (a, i) if neededIds(a.exprId.id) => Alias(a, s"__${p}_c$i")()
      }
      var extra = List.empty[Alias]
      def nameOf(ex: Expression, fallback: String): String = ex match {
        case a: Attribute
            if child.output.exists(_.exprId == a.exprId) =>
          s"__${p}_c${child.output.indexWhere(_.exprId == a.exprId)}"
        case _ =>
          extra ::= Alias(ex, fallback)()
          fallback
      }
      val keyNames = keys.zipWithIndex.map { case (k, i) =>
        nameOf(k, s"__${p}_k$i") }
      val sName = nameOf(s, s"__${p}_s")
      val eName = nameOf(e, s"__${p}_e")
      (Project(passthrough ++ extra.reverse, child), keyNames, sName, eName)
    }

    val (lPlan, lKeyNames, lsName, leName) =
      proj(join.left, join.leftKeys, join.lStart, join.lEnd, "asl")
    val (rPlan, rKeyNames, rsName, reName) =
      proj(join.right, join.rightKeys, join.rStart, join.rEnd, "asr")
    val lDf = SweepPlanBuilder.ofRows(spark, lPlan)
    val rDf = SweepPlanBuilder.ofRows(spark, rPlan)
    val lSpec = IntervalSpec(Some(lsName), Some(leName),
      join.lClosedStart, join.lClosedEnd)
    val rSpec = IntervalSpec(Some(rsName), Some(reName),
      join.rClosedStart, join.rClosedEnd)

    // semantics probe, FOLDED into the stats pass (round 12 — was a
    // separate existence scan of both inputs, i.e. the inputs were read
    // twice before the join): any non-null-endpoint EMPTY interval
    // anywhere -> the operator chain's ingress filter would drop rows
    // the raw conjuncts can match -> autoProbed returns None and the
    // dispatch falls back. For closed point probes the full probe is
    // provably redundant EXCEPT for NaN left endpoints under floating
    // types (see [[AutoSaltedSweepJoin.closedPointProbe]]):
    // integral/date/timestamp probes fold in nothing (the common as-of
    // shape pays zero checks beyond auto's own stats pass);
    // float/double probes fold a left-only NaN check into the same
    // aggregation.
    def dangerCol(df: DataFrame, spec: IntervalSpec) =
      not(Intervals.nonEmpty(df, spec)) &&
        col(spec.start.get).isNotNull && col(spec.stop.get).isNotNull
    val (dangerL, dangerR) =
      if (join.closedPointProbe) {
        import org.apache.spark.sql.functions.isnan
        import org.apache.spark.sql.types.{DoubleType, FloatType}
        val nanChecks = Seq(
          join.lStart.dataType -> lsName, join.lEnd.dataType -> leName)
          .collect { case (t, n) if t == DoubleType || t == FloatType =>
            isnan(col(n)) }
        (if (join.leftEndpointsFloating) Some(nanChecks.reduce(_ || _))
         else None,
          None)
      } else {
        (Some(dangerCol(lDf, lSpec)), Some(dangerCol(rDf, rSpec)))
      }

    graft.joins.SaltedSweepJoin.autoProbed(lDf, rDf,
      lKeyNames, rKeyNames, lSpec, rSpec,
      dangerL = dangerL, dangerR = dangerR,
      nullSafeKeys = join.matchNullKeys) match {
      case None =>
        // exact fallback: the raw sweep node over the ORIGINAL plans —
        // conjunct-exact semantics; a pruned requiredOutput becomes a
        // Project over the raw node (same boundary width both paths)
        val raw = join.toRawSweep
        val rawPlan: LogicalPlan =
          if (output.length == raw.output.length) raw
          else Project(output, raw)
        SweepPlanBuilder.ofRows(spark, rawPlan).queryExecution.toRdd
      case Some(res) =>
        // positional re-projection pruned to this node's declared
        // output: ordinals (and types) line up attribute-for-attribute,
        // and only the columns the parent consumes cross the leaf-exec
        // boundary. When the declared output IS the nested result —
        // full width, bare-column keys/endpoints (no extra alias
        // columns) — the projection is skipped outright: no per-match-
        // row copy at the boundary.
        val synthName: Map[Long, String] =
          (join.left.output.zipWithIndex.map { case (a, i) =>
            a.exprId.id -> s"__asl_c$i" } ++
            join.right.output.zipWithIndex.map { case (a, i) =>
              a.exprId.id -> s"__asr_c$i" }).toMap
        val outNames = output.map(a => synthName(a.exprId.id))
        if (outNames == res.columns.toSeq) res.queryExecution.toRdd
        else res.select(outNames.map(col): _*).queryExecution.toRdd
    }
  }
}
