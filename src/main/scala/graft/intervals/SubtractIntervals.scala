package graft.intervals

import graft.core.{IntervalSpec, Intervals}
import graft.joins.IntervalJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-frame interval subtraction: trim every left interval by the
  * union of the right intervals sharing its keys, keeping the left
  * row's other columns on every emitted piece.
  *
  * The curation shape this serves: "remove blackout / contaminated /
  * embargoed time ranges from each session (user_id-keyed)". Neither
  * `merge_intervals` nor `combine_intervals` expresses it — the
  * reference composes it by hand; here it is one call that reuses both
  * building blocks' scale paths.
  *
  * Semantics — half-open `[start, stop)` on a continuum, deliberately:
  * subtraction is closed under half-open intervals (`[1,10) \ [3,5)` =
  * `[1,3) ∪ [5,10)` with no endpoint-closedness bookkeeping), and it
  * matches the `make_windows`/resample window convention (start
  * inclusive, stop exclusive). Consequences, all specced:
  *   - left rows with `start >= stop` or NA/NaN endpoints are EMPTY
  *     intervals and emit nothing (the `combine_intervals` zero-length
  *     convention, `misc.py:429`);
  *   - right rows that are empty under the same rule subtract nothing;
  *   - touching right intervals (`[1,3)`,`[3,5)`) behave as their union
  *     `[1,5)`; a right interval covering the whole left row deletes it;
  *   - output pieces are maximal and non-empty (`start < stop`).
  *
  * Plan, in three reused pieces:
  *   1. right coverage = [[CombineIntervals]] union per key (sweep-line
  *      depth counting — the merged pieces are DISJOINT and sorted,
  *      which is what makes step 3 a single window pass);
  *   2. one keyed overlap [[IntervalJoin]] (`how = "left"`) of the
  *      stamped left frame against the merged coverage — `binWidth` /
  *      `autoBinWidth` pass through, so coarse-key workloads get the
  *      binned scale path exactly like a direct `merge_intervals` call;
  *   3. per-left-row gap extraction: one window partitioned by the left
  *      row id ordered by coverage start (`lag` for the gap before each
  *      covering piece, `row_number = count` for the tail gap). The
  *      partition is a single left row's matches — bounded by that
  *      row's true overlap density, never a hot key's.
  *
  * @param leftIdCol existing UNIQUE per-row id column of `left` used as
  *                  the window partition key; generated
  *                  (`monotonically_increasing_id`) when None — like
  *                  [[IntervalJoin]]'s generated ids, only safe off a
  *                  stable scan (no upstream repartition/sample).
  */
object SubtractIntervals {

  private val Lid = "__graft_sub_lid"
  private val Rs  = "__graft_sub_rs"
  private val Re  = "__graft_sub_re"

  def apply(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String] = Nil,
      startCol: String = "start",
      stopCol: String = "stop",
      rightStartCol: String = "start",
      rightStopCol: String = "stop",
      leftIdCol: Option[String] = None,
      binWidth: Option[Double] = None,
      autoBinWidth: Boolean = false): DataFrame = {
    require(left.columns.contains(startCol) && left.columns.contains(stopCol),
      s"left must contain $startCol/$stopCol")
    require(right.columns.contains(rightStartCol) &&
        right.columns.contains(rightStopCol),
      s"right must contain $rightStartCol/$rightStopCol")
    require(on.forall(k => left.columns.contains(k) &&
        right.columns.contains(k)),
      "every key in `on` must exist in both frames")

    val halfOpenL = IntervalSpec(Some(startCol), Some(stopCol),
      includeStart = true, includeStop = false)
    val halfOpenR = IntervalSpec(Some(rightStartCol), Some(rightStopCol),
      includeStart = true, includeStop = false)

    // 1. merged right coverage per key: disjoint, sorted pieces. Empty
    // right intervals subtract nothing — filtered by the same rule that
    // drops empty left rows. Renamed so no output suffixing is needed.
    val rValid = right.filter(Intervals.nonEmpty(right, halfOpenR))
      .select((on.map(col) :+ col(rightStartCol).as(Rs)) :+
        col(rightStopCol).as(Re): _*)
    val coverage = CombineIntervals(rValid,
      startCol = Rs, stopCol = Some(Re), groupBy = on, nMin = 1)
    val rKeyed = on.zipWithIndex.foldLeft(coverage) { case (df, (k, i)) =>
      df.withColumnRenamed(k, s"__graft_sub_k$i")
    }

    // 2. stamp the left row id and join against the coverage. Empty left
    // intervals emit nothing (the half-open zero-length convention), so
    // they are dropped BEFORE the join rather than carried as unmatched.
    // The match phase is an INNER IntervalJoin — which auto-routes to the
    // custom sweep exec for keyed shapes at scale (and takes the binned
    // path when binWidth is passed) — plus an anti-join completion that
    // restores rows no coverage touches. Both subtrees re-read the
    // stamped frame, so generated ids are pinned with a lazy
    // localCheckpoint (same contract as IntervalJoin's own completion;
    // caller-supplied ids skip the pin).
    val lid = leftIdCol.getOrElse(Lid)
    val lValid = left.filter(Intervals.nonEmpty(left, halfOpenL))
    val lStamped0 =
      if (leftIdCol.isDefined) lValid
      else lValid.withColumn(lid, monotonically_increasing_id())
    val lStamped =
      if (leftIdCol.isDefined) lStamped0 else lStamped0.localCheckpoint(false)
    val carried = left.columns.toSeq :+ lid
    val matched = IntervalJoin(
      lStamped, rKeyed,
      leftSpec = halfOpenL,
      rightSpec = IntervalSpec(Some(Rs), Some(Re),
        includeStart = true, includeStop = false),
      leftOn = on, rightOn = on.indices.map(i => s"__graft_sub_k$i").toSeq,
      how = "inner", keep = "all", keepOrder = false,
      leftIdCol = Some(lid),
      binWidth = binWidth, autoBinWidth = autoBinWidth)
      .select((carried.distinct.map(col) :+ col(Rs)) :+ col(Re): _*)
    val rsType = rValid.schema(Rs).dataType
    val reType = rValid.schema(Re).dataType
    val unmatched = lStamped
      .join(matched.select(col(lid)).distinct(), Seq(lid), "left_anti")
      .withColumn(Rs, lit(null).cast(rsType))
      .withColumn(Re, lit(null).cast(reType))
      .select((carried.distinct.map(col) :+ col(Rs)) :+ col(Re): _*)
    val joined = matched.unionByName(unmatched)

    // 3. gap extraction per left row. The coverage pieces matched to one
    // left row are disjoint and sorted by Rs, so the complement inside
    // [start, stop) is: the gap before each piece (from the previous
    // piece's stop, clamped into the left interval) plus one tail gap
    // after the last piece.
    val wAsc = Window.partitionBy(col(lid)).orderBy(col(Rs))
    // window columns projected first (window functions cannot be nested
    // inside the explode generator expression). Both functions share one
    // window spec, so this is a SINGLE WindowExec: `lead(Rs) IS NULL`
    // marks the last covering piece (every matched row of a lid has a
    // non-null Rs, and the unmatched completion row is alone in its
    // partition and takes the Rs-null branch below) — the earlier
    // `row_number = count` formulation needed a second, unbounded-frame
    // window pass for the count.
    val windowed = joined
      .withColumn("__graft_sub_prev", lag(col(Re), 1).over(wAsc))
      .withColumn("__graft_sub_last", lead(col(Rs), 1).over(wAsc).isNull)
    val ls = col(startCol)
    val le = col(stopCol)
    val before = struct(
      greatest(ls, coalesce(col("__graft_sub_prev"), ls)).as("s"),
      least(le, col(Rs)).as("e"))
    val tail = struct(greatest(ls, col(Re)).as("s"), le.as("e"))
    val segs = when(col(Rs).isNull, array(struct(ls.as("s"), le.as("e"))))
      .when(col("__graft_sub_last"), array(before, tail))
      .otherwise(array(before))

    val exploded = windowed
      .withColumn("__graft_sub_seg", explode(segs))
      .filter(col("__graft_sub_seg.s") < col("__graft_sub_seg.e"))
    // left schema back in order, start/stop replaced by the piece bounds
    val outCols = left.columns.toSeq.map {
      case `startCol` => col("__graft_sub_seg.s").as(startCol)
      case `stopCol`  => col("__graft_sub_seg.e").as(stopCol)
      case c          => col(c)
    }
    exploded.select(outCols: _*)
  }
}
