package graft.agg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group winsorization: clip a numeric column to its group's
  * `[lower, upper]` quantiles (pandas-style linear interpolation, the
  * same convention as `resample_eav`'s `pXX` aggregates,
  * `resampling.py:216-224`). The standard outlier treatment before
  * computing corpus statistics or quality-score thresholds.
  *
  * Scale posture: the built-in `percentile` aggregate buffers every
  * value per group in an object hash map (the memory cliff documented
  * in [[graft.resample.ResampleEav]]); this instead ranks values with
  * `row_number` over a spillable Tungsten sort and derives each bound
  * by conditional aggregation over the SAME window partitioning — the
  * exchange and sort are planned once and reused across the rank pass,
  * both bound passes, and the clip projection. One shuffle total, no
  * join, any group size.
  */
object Winsorize {

  /** Adds `<valueCol>_w` (clipped value), `w_lo`, `w_hi` (the group's
    * interpolated quantile bounds). Null values rank nowhere, receive
    * null bounds-clips, and do not influence the quantiles. Groups with
    * a single value clip to it (all quantiles coincide).
    */
  def apply(df: DataFrame, valueCol: String, groupBy: Seq[String],
            lower: Double = 0.05, upper: Double = 0.95): DataFrame = {
    require(groupBy.nonEmpty, "winsorization is per-group; pass group keys")
    require(0 <= lower && lower <= upper && upper <= 1, "need 0 <= lower <= upper <= 1")

    val v    = col(valueCol).cast("double")
    val grp  = Window.partitionBy(groupBy.map(col): _*)
    val byV  = grp.orderBy(v.asc_nulls_last)

    val rn = row_number().over(byV)
    val n  = count(v).over(grp)

    // pandas linear interpolation: h = (n-1)q; bound = v[⌊h⌋+1]·(1−g) + v[⌊h⌋+2]·g
    // (1-based ranks, g = h − ⌊h⌋; the second term's rank exists whenever g > 0)
    def bound(q: Double): Column = {
      val h = (n - 1).cast("double") * q
      val k = floor(h)
      val g = h - k
      sum(
        when(col("__graft_rn") === k + 1, v * (lit(1.0) - g))
          .when(col("__graft_rn") === k + 2, v * g)
      ).over(grp)
    }

    df.withColumn("__graft_rn", rn)
      .withColumn("w_lo", bound(lower))
      .withColumn("w_hi", bound(upper))
      // greatest/least SKIP nulls (they'd clip a null value to w_lo)
      .withColumn(s"${valueCol}_w",
        when(v.isNotNull, least(greatest(v, col("w_lo")), col("w_hi"))))
      .drop("__graft_rn")
  }
}
