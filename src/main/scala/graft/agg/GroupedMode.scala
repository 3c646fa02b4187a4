package graft.agg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Grouped mode + multiplicity — reimplementation of the reference's
  * `grouped_mode` (`/root/reference/catabra_pandas/misc.py:848-936`).
  *
  * One row per group with columns `mode` and `count`:
  *   - `dropna = true`: nulls ignored; a group whose values are all null
  *     still appears, with null mode and count 0 (`misc.py:869-872`);
  *   - `dropna = false`: null counts as a regular value (`misc.py:909-917`);
  *   - rows with null group keys are always ignored;
  *   - ties: the reference breaks them by its stable sort, which lands on
  *     the smallest value (groups are pre-sorted by value before the
  *     stable count sort, `misc.py:930-933`) — we order by
  *     `(count desc, value asc nulls last)` for the same result,
  *     deterministically.
  *
  * Plan: `groupBy(keys, value).count()` (map-side partial agg) then a
  * window top-1 per key — two shuffles total. Null values stay IN the
  * count table under both dropna modes; `dropna = true` merely ranks
  * them strictly last, so an all-null group's only candidate row (null)
  * survives to the top and is rewritten to `(null, 0)` afterwards. The
  * naive spelling — drop nulls, then `distinct` + left-join the group
  * universe back to resurrect all-null groups — costs a third
  * aggregation exchange plus a join for information the count table
  * already holds.
  */
object GroupedMode {

  def apply(
      df: DataFrame,
      groupBy: Seq[String],
      valueCol: String,
      dropna: Boolean = true,
      modeCol: String = "mode",
      countCol: String = "count"): DataFrame = {

    require(groupBy.nonEmpty, "groupBy must be non-empty")

    val keysNotNull = groupBy.map(col(_).isNotNull).reduce(_ && _)
    val base = df.filter(keysNotNull)

    val counted = base
      .groupBy((groupBy :+ valueCol).map(col): _*)
      .agg(count(lit(1)).as(countCol))

    // dropna=true: non-null candidates strictly outrank null, so null
    // wins only in an all-null group (rewritten to count 0 below, the
    // reference's convention). dropna=false: null is a regular
    // candidate that loses exact ties (asc_nulls_last), matching the
    // reference's value-presorted stable sort.
    val ordering =
      if (dropna)
        Seq(col(valueCol).isNull.asc, col(countCol).desc,
          col(valueCol).asc_nulls_last)
      else Seq(col(countCol).desc, col(valueCol).asc_nulls_last)
    val w = Window.partitionBy(groupBy.map(col): _*).orderBy(ordering: _*)
    val best = counted
      .withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") === 1)
      .drop("__graft_rn")
      .withColumnRenamed(valueCol, modeCol)

    if (dropna)
      best.withColumn(countCol,
        when(col(modeCol).isNull, lit(0L)).otherwise(col(countCol)))
    else best
  }
}
