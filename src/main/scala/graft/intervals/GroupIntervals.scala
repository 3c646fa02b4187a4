package graft.intervals

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Single-linkage interval clustering — reimplementation of the reference's
  * `group_intervals` (`/root/reference/catabra_pandas/misc.py:125-257`).
  *
  * Two intervals connect iff their single-linkage distance is ≤ `distance`
  * (`<` when `inclusive = false`); the output groups are the equivalence
  * classes of the reflexive-transitive closure, refined by `groupBy`.
  *
  * Algorithm (same O(n log n) sweep as the reference, `misc.py:226-254`,
  * whose correctness argument for the running maximum is at
  * `misc.py:238-246`): per group, sorted by start, a new cluster begins
  * where `start > cummax(previous stops) + distance`. Cluster ids are
  * globally consecutive in (groupBy, start) order like the reference's.
  *
  * Scale: the sweep itself runs in per-group windows (one shuffle). The
  * global id offsets are computed on a tiny per-group frame (one row per
  * group) — the only non-partitioned step, linear in the number of groups,
  * not rows.
  */
object GroupIntervals {

  def apply(
      df: DataFrame,
      startCol: String,
      stopCol: Option[String] = None,
      groupBy: Seq[String] = Nil,
      distance: Column,
      inclusive: Boolean = true,
      outCol: String = "interval_group",
      tieBreakCols: Seq[String] = Nil): DataFrame = {

    val stop = stopCol.getOrElse(startCol)
    val rid  = "__graft_rid"
    val base = df.withColumn(rid, monotonically_increasing_id())

    val gb = groupBy.map(col)
    // pandas sort_values is stable and puts NA last; tieBreakCols make the
    // equal-start order explicit (the reference falls back to input order,
    // which a distributed engine cannot promise without a column)
    val ord = (col(startCol).asc_nulls_last +:
      tieBreakCols.map(col(_).asc_nulls_last)) :+ col(rid).asc
    val w = Window.partitionBy(gb: _*).orderBy(ord: _*)

    // running max of *previous* stops (strictly before the current row)
    val cm = max(col(stop)).over(w.rowsBetween(Window.unboundedPreceding, -1))
    val connected =
      if (inclusive) col(startCol) <= cm + distance
      else col(startCol) < cm + distance
    val newCluster = when(cm.isNull || !connected, 1L).otherwise(0L)

    val clustered = base
      .withColumn("__graft_new", newCluster)
      .withColumn("__graft_local",
        sum(col("__graft_new")).over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1)

    if (groupBy.isEmpty) {
      clustered.withColumn(outCol, col("__graft_local"))
        .drop("__graft_new", "__graft_local", rid)
    } else {
      // per-group cluster counts -> global offsets. One row per group, so
      // the exclusive prefix sum runs through the scalable two-phase
      // PrefixSum (a global orderBy window would single-partition 1e8
      // groups), and the join back is left to Catalyst/AQE (an explicit
      // broadcast of a per-group frame would OOM at scale)
      val counts = clustered.groupBy(gb: _*)
        .agg((max(col("__graft_local")) + 1).as("__graft_n"))
      val offsets = graft.core.PrefixSum.inclusive(
          counts, groupBy.map(c => col(c).asc_nulls_last), col("__graft_n"),
          "__graft_cum")
        .withColumn("__graft_off", col("__graft_cum") - col("__graft_n"))
        .drop("__graft_n", "__graft_cum")

      clustered
        .join(offsets, groupBy, "left")
        .withColumn(outCol, col("__graft_off") + col("__graft_local"))
        .drop("__graft_new", "__graft_local", "__graft_off", rid)
    }
  }
}
