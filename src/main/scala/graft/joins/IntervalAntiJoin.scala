package graft.joins

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.IntervalSpec

/** Interval ANTI-join: the left rows that overlap NO right interval —
  * "events outside every blackout window", "points uncovered by any
  * validity range", time-range decontamination. The complement of
  * [[IntervalJoin]]'s match set over the same 16-combination closedness
  * truth table (merging.py:437-455), so every semantic knob (open/closed
  * endpoints, ±∞ bounds, equality keys, null-safe keys) carries over.
  *
  * Spark alone plans a keyless `NOT EXISTS` range condition as a
  * broadcast-nested-loop anti join; with `binWidth` this instead rides
  * the binned equi-join scale path and completes with a hash anti-join
  * on the surviving row ids.
  *
  * Scale posture: one [[IntervalJoin]] `keep="first"` pass (each left
  * row retains at most ONE match — the anti test needs existence, not
  * multiplicity, so the pair explosion is capped at |left|) followed by
  * a null filter on a right-side marker. No second join, no shuffle
  * beyond the underlying interval join's.
  */
object IntervalAntiJoin {

  /** Left rows with no overlapping right interval, original columns. */
  def apply(
      left: DataFrame,
      right: DataFrame,
      leftSpec: IntervalSpec,
      rightSpec: IntervalSpec,
      on: Seq[String] = Nil,
      leftOn: Seq[String] = Nil,
      rightOn: Seq[String] = Nil,
      nullSafeKeys: Boolean = true,
      binWidth: Option[Double] = None): DataFrame = {

    // rename every right column out of collision range so the output is
    // exactly `left`'s schema after the drop (no _x/_y suffixing)
    val p = "__graft_anti_"
    val renamed = right.columns.foldLeft(right)((d, c) => d.withColumnRenamed(c, p + c))
    val rSpec = rightSpec.copy(
      start = rightSpec.start.map(p + _), stop = rightSpec.stop.map(p + _))
    val marked = renamed.withColumn(s"${p}match", lit(1))

    val joined = IntervalJoin(
      left, marked, leftSpec, rSpec,
      leftOn = (if (on.nonEmpty) on else leftOn),
      rightOn = (if (on.nonEmpty) on else rightOn).map(p + _),
      how = "left", keep = "first", keepOrder = false,
      suffixes = (None, None),
      nullSafeKeys = nullSafeKeys, binWidth = binWidth)

    joined.filter(col(s"${p}match").isNull)
      .select(left.columns.map(col): _*)
  }
}
