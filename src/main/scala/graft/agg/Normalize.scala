package graft.agg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group score normalization — the step between computing raw
  * quality signals ([[graft.text.TextStats]], [[graft.text.NgramLm]])
  * and thresholding them: raw scores are not comparable across
  * languages/sources, normalized ones are.
  *
  * Methods:
  *  - `zscore`: (v − mean) / stddev_samp; null when the group has < 2
  *    values or zero variance.
  *  - `minmax`: (v − min) / (max − min) into [0, 1]; null when the
  *    group is constant.
  *  - `rank`: percent_rank ordered by value — (rank−1)/(n−1) with
  *    competition ranking, so ties share a value and the result is
  *    deterministic without a tiebreak column; integer-ratio arithmetic
  *    makes it bit-exact across engines.
  *
  * Scale posture: one shuffle on the group keys. `zscore`/`minmax` are
  * unbounded window aggregates (no sort needed); `rank` adds a window
  * sort — requested together they share the single exchange, and the
  * sort is a spillable Tungsten sort. Null values rank nowhere and
  * normalize to null; they never influence the group statistics.
  */
object Normalize {

  /** Adds `<valueCol>_<method>` per requested method. */
  def apply(df: DataFrame, valueCol: String, groupBy: Seq[String],
            methods: Seq[String]): DataFrame = {
    require(groupBy.nonEmpty, "normalization is per-group; pass group keys")
    require(methods.nonEmpty, "no methods requested")

    val v   = col(valueCol).cast("double")
    val grp = Window.partitionBy(groupBy.map(col): _*)

    val cols: Seq[(String, Column)] = methods.map {
      case "zscore" =>
        val sd = stddev_samp(v).over(grp)
        s"${valueCol}_zscore" ->
          when(sd.isNotNull && sd =!= 0.0, (v - avg(v).over(grp)) / sd)
      case "minmax" =>
        val lo = min(v).over(grp)
        val hi = max(v).over(grp)
        s"${valueCol}_minmax" ->
          when(hi =!= lo, (v - lo) / (hi - lo))
      case "rank" =>
        // explicit (rank−1)/(n_nonnull−1) rather than percent_rank():
        // percent_rank's denominator counts NULL rows, and default asc
        // ordering puts nulls first, shifting every rank
        val rk = rank().over(grp.orderBy(v.asc_nulls_last))
        val n  = count(v).over(grp)
        s"${valueCol}_rank" ->
          when(v.isNotNull,
            when(n === 1, lit(0.0))
              .otherwise((rk - 1).cast("double") / (n - 1).cast("double")))
      case other =>
        throw new IllegalArgumentException(s"unknown normalization: $other")
    }
    cols.foldLeft(df) { case (d, (name, c)) => d.withColumn(name, c) }
  }
}
