package graft.joins

import graft.core.Intervals
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval lookup — reimplementation of the reference's
  * `find_containing_interval` (`/root/reference/catabra_pandas/merging.py:511-649`).
  *
  * For every point (one or more point columns at once, `merging.py:533-535`)
  * returns the id of the first and/or last containing interval — "first/last"
  * by the intervals' original row order — and −1 if no interval contains the
  * point. Optional equality keys (`group_by`) restrict candidate intervals.
  *
  * Plan: per point column, a left join `points → intervals` on the equality
  * keys plus the containment predicate, then `groupBy(point-row)` with
  * `min/max(interval id)` — one shuffle per point column, all Catalyst
  * built-ins. Output is `points` plus `<pointCol>_first` / `<pointCol>_last`
  * long columns (only those requested by `which`).
  */
object FindContainingInterval {

  def apply(
      intervals: DataFrame,
      points: DataFrame,
      pointCols: Seq[String],
      on: Seq[String] = Nil,           // equality keys present in both sides
      startCol: Option[String] = None,
      stopCol: Option[String] = None,
      includeStart: Boolean = true,
      includeStop: Boolean = true,
      which: String = "both",          // first | last | both
      intervalIdCol: Option[String] = None,
      lengthCol: Option[String] = None): DataFrame = {

    require(Seq("first", "last", "both").contains(which), s"which=$which")
    require(startCol.isDefined || stopCol.isDefined,
      "at least one of startCol/stopCol is required")
    require(lengthCol.isEmpty || (startCol.isDefined ^ stopCol.isDefined),
      "lengthCol requires exactly one of startCol/stopCol (merging.py:545-547)")

    val iid = "__graft_iid"
    val pid = "__graft_pid"

    // length_col alternative: derive the missing endpoint (merging.py:582-594)
    val (intervals0, startCol0, stopCol0) = lengthCol match {
      case Some(lc) if startCol.isDefined =>
        val sc = "__graft_stop"
        (intervals.withColumn(sc, col(startCol.get) + col(lc)),
          startCol, Some(sc))
      case Some(lc) =>
        val sc = "__graft_start"
        (intervals.withColumn(sc, col(stopCol.get) - col(lc)),
          Some(sc), stopCol)
      case None => (intervals, startCol, stopCol)
    }

    val ivBase = intervalIdCol match {
      case Some(c) => intervals0.withColumn(iid, col(c).cast("long"))
      case None    => intervals0.withColumn(iid, monotonically_increasing_id())
    }
    // drop empty intervals (NaN/null endpoints match nothing anyway, but
    // pruning them shrinks the join's build side)
    val spec = graft.core.IntervalSpec(startCol0, stopCol0, includeStart, includeStop)
    val iv = ivBase
      .filter(Intervals.nonEmpty(ivBase, spec))
      .select((on.map(col) ++ startCol0.map(col) ++ stopCol0.map(col) :+ col(iid)): _*)

    val pts = points.withColumn(pid, monotonically_increasing_id())

    val rPrefix = "__graft_i_"
    val ivR = iv.columns.foldLeft(iv)((d, c) => d.withColumnRenamed(c, rPrefix + c))
    def iCol(c: String): Column = col(rPrefix + c)

    pointCols.foldLeft(pts) { (acc, pc) =>
      val keyCond = on.map(k => col(k) <=> iCol(k))
      val containCond = Intervals.contains(
        startCol0.map(iCol), stopCol0.map(iCol), includeStart, includeStop, col(pc))
      val cond = (keyCond :+ containCond).reduce(_ && _)

      val aggs = Seq(
        "first" -> min(iCol(iid)), "last" -> max(iCol(iid))
      ).collect { case (w, a) if which == "both" || which == w =>
        coalesce(a, lit(-1L)).as(s"${pc}_$w")
      }

      val lookup = pts
        .select((col(pid) +: on.map(col)) :+ col(pc): _*)
        .join(ivR, cond, "left")
        .groupBy(col(pid))
        .agg(aggs.head, aggs.tail: _*)

      acc.join(lookup, Seq(pid), "left")
    }.drop(pid)
  }
}
