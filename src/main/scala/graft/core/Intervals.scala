package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType}

/** One side of an interval join / containment operator.
  *
  * Mirrors the reference's endpoint conventions
  * (`/root/reference/catabra_pandas/merging.py:67-86`):
  *   - `start = None`  ⇒ no lower endpoint (−∞)
  *   - `stop  = None`  ⇒ no upper endpoint (+∞)
  *   - `start == stop` (same column name) ⇒ isolated points
  *   - `includeStart` / `includeStop`     ⇒ closed endpoint
  *
  * Intervals are sets of points on a continuum: `(0,1)` over ints is
  * non-empty (`merging.py:125-130`).
  */
final case class IntervalSpec(
    start: Option[String],
    stop: Option[String],
    includeStart: Boolean = true,
    includeStop: Boolean = true) {

  /** start and stop name the same column ⇒ isolated points. */
  def isPoint: Boolean = start.isDefined && start == stop

  require(start.isDefined || stop.isDefined || (start.isEmpty && stop.isEmpty),
    "invalid IntervalSpec")
}

object IntervalSpec {
  def point(col: String): IntervalSpec = IntervalSpec(Some(col), Some(col))
  def closed(start: String, stop: String): IntervalSpec =
    IntervalSpec(Some(start), Some(stop))
  def unboundedBelow(stop: String, include: Boolean = true): IntervalSpec =
    IntervalSpec(None, Some(stop), includeStop = include)
  def unboundedAbove(start: String, include: Boolean = true): IntervalSpec =
    IntervalSpec(Some(start), None, includeStart = include)
}

/** Shared interval predicates: validity (non-empty) filters and the
  * overlap condition, including per-endpoint closedness and NaN rules.
  */
object Intervals {

  /** `true` iff the column can hold NaN (Spark sorts NaN above +Inf and
    * `NaN <= NaN` is true, so plain comparisons do NOT drop NaN rows —
    * guards must be explicit; see SURVEY.md §7.4 "Null vs NaN").
    */
  private def floating(df: DataFrame, c: String): Boolean =
    df.schema(c).dataType match {
      case DoubleType | FloatType => true
      case _                      => false
    }

  private def notNaNNotNull(df: DataFrame, c: String): Column =
    if (floating(df, c)) col(c).isNotNull && !isnan(col(c))
    else col(c).isNotNull

  /** Filter keeping exactly the non-empty intervals of `spec`, following
    * `merging.py:230-288`:
    *   - one-sided: the present endpoint must be non-NA;
    *   - points (same column): non-NA, but only if both endpoints are
    *     included — otherwise every point is empty;
    *   - two-sided: `start <= stop` when both endpoints included, else
    *     `start < stop`; any NaN/null endpoint ⇒ empty.
    */
  def nonEmpty(df: DataFrame, spec: IntervalSpec): Column =
    (spec.start, spec.stop) match {
      case (None, None)       => lit(true)
      case (None, Some(b))    => notNaNNotNull(df, b)
      case (Some(a), None)    => notNaNNotNull(df, a)
      case (Some(a), Some(b)) if spec.isPoint =>
        if (spec.includeStart && spec.includeStop) notNaNNotNull(df, a)
        else lit(false) // open "point" is the empty set (merging.py:240-249)
      case (Some(a), Some(b)) =>
        val cmp =
          if (spec.includeStart && spec.includeStop) col(a) <= col(b)
          else col(a) < col(b)
        cmp && notNaNNotNull(df, a) && notNaNNotNull(df, b)
    }

  /** Overlap predicate between two *non-empty* intervals, equivalent to
    * the reference's 16-row truth table (`merging.py:437-455`):
    * intervals `La,bR` and `Lc,dR` overlap iff
    *   `a <op1> d  AND  c <op2> b`
    * where `<op1>` is `<=` iff both touching endpoints are included
    * (`includeStart(left) && includeStop(right)`), else `<`; `<op2>`
    * symmetric. A missing endpoint drops its conjunct (±∞).
    *
    * Callers pass resolved Columns (sides may have been renamed to avoid
    * ambiguity); a `None` column means that endpoint is unbounded.
    */
  def overlap(
      lStart: Option[Column], lStop: Option[Column],
      includeLeftStart: Boolean, includeLeftStop: Boolean,
      rStart: Option[Column], rStop: Option[Column],
      includeRightStart: Boolean, includeRightStop: Boolean): Column = {
    val conj1 = for (a <- lStart; d <- rStop) yield
      if (includeLeftStart && includeRightStop) a <= d else a < d
    val conj2 = for (c <- rStart; b <- lStop) yield
      if (includeRightStart && includeLeftStop) c <= b else c < b
    (conj1, conj2) match {
      case (Some(x), Some(y)) => x && y
      case (Some(x), None)    => x
      case (None, Some(y))    => y
      case (None, None)       => lit(true)
    }
  }

  /** Containment of a point in an interval: special case of [[overlap]]
    * with a degenerate (closed) point side.
    */
  def contains(
      start: Option[Column], stop: Option[Column],
      includeStart: Boolean, includeStop: Boolean,
      point: Column): Column =
    overlap(
      start, stop, includeStart, includeStop,
      Some(point), Some(point), includeRightStart = true, includeRightStop = true)
}
