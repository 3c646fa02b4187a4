package graft.intervals

import graft.core.{IntervalSpec, Intervals}
import graft.joins.IntervalJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Two-frame interval intersection: clip every left interval to the
  * union of the right intervals sharing its keys, keeping the left
  * row's other columns on every emitted piece. The complement of
  * [[SubtractIntervals]] under the same half-open `[start, stop)`
  * convention — together with [[CombineIntervals]] (union) they close
  * the keyed interval algebra.
  *
  * The curation shape this serves: "keep only the in-coverage portion
  * of each session" — e.g. clip activity spans to licensed/consented
  * collection windows, or measure covered uptime. The reference builds
  * this by hand from `merge_intervals` output (`merging.py:62` gives
  * the overlap join; the clamp is left to the caller); here it is one
  * call on the same scale paths.
  *
  * Semantics (all specced):
  *   - half-open `[start, stop)`; left or right rows with
  *     `start >= stop` or NA/NaN endpoints are EMPTY and contribute
  *     nothing (the `combine_intervals` zero-length convention,
  *     `misc.py:429`);
  *   - output pieces are `[max(ls, rs), min(le, re))` for each merged
  *     coverage piece overlapping the left row — since the merged
  *     coverage is DISJOINT, the emitted pieces per left row are
  *     disjoint, maximal, and non-empty by construction;
  *   - a left row with no overlapping coverage emits nothing (inner
  *     semantics — intersection with the empty set is empty);
  *   - touching right intervals behave as their union.
  *
  * Plan — two reused pieces, NO per-row window pass (unlike
  * subtraction, intersection needs no gap walk: each matched coverage
  * piece yields exactly one output piece independently):
  *   1. right coverage = [[CombineIntervals]] union per key (sweep-line
  *      depth counting ⇒ disjoint sorted pieces);
  *   2. one keyed overlap [[IntervalJoin]] (inner) of the left frame
  *      against the coverage, projecting the clamped bounds. The join
  *      auto-routes to the custom sweep exec for keyed shapes and takes
  *      the binned path when `binWidth`/`autoBinWidth` is passed —
  *      identical 100 TB posture to a direct `merge_intervals` call.
  */
object IntersectIntervals {

  private val Rs = "__graft_isect_rs"
  private val Re = "__graft_isect_re"

  def apply(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String] = Nil,
      startCol: String = "start",
      stopCol: String = "stop",
      rightStartCol: String = "start",
      rightStopCol: String = "stop",
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

    // 1. merged right coverage per key. Renamed so no suffixing is
    // needed and key collisions with left attribute names cannot occur.
    val rValid = right.filter(Intervals.nonEmpty(right, halfOpenR))
      .select((on.map(col) :+ col(rightStartCol).as(Rs)) :+
        col(rightStopCol).as(Re): _*)
    val coverage = CombineIntervals(rValid,
      startCol = Rs, stopCol = Some(Re), groupBy = on, nMin = 1)
    val rKeyed = on.zipWithIndex.foldLeft(coverage) { case (df, (k, i)) =>
      df.withColumnRenamed(k, s"__graft_isect_k$i")
    }

    // 2. inner overlap join + clamp. Empty left intervals can match
    // nothing under the half-open overlap condition, but are filtered
    // anyway so NaN endpoints cannot poison the clamp.
    val lValid = left.filter(Intervals.nonEmpty(left, halfOpenL))
    val joined = IntervalJoin(
      lValid, rKeyed,
      leftSpec = halfOpenL,
      rightSpec = IntervalSpec(Some(Rs), Some(Re),
        includeStart = true, includeStop = false),
      leftOn = on, rightOn = on.indices.map(i => s"__graft_isect_k$i").toSeq,
      how = "inner", keep = "all", keepOrder = false,
      binWidth = binWidth, autoBinWidth = autoBinWidth)

    // left schema back in order, start/stop replaced by the clamped
    // piece bounds (non-empty by the overlap condition, asserted by the
    // filter for NaN hygiene).
    val outCols = left.columns.toSeq.map {
      case `startCol` => greatest(col(startCol), col(Rs)).as(startCol)
      case `stopCol`  => least(col(stopCol), col(Re)).as(stopCol)
      case c          => col(c)
    }
    joined.select(outCols: _*)
      .filter(col(startCol) < col(stopCol))
  }
}
