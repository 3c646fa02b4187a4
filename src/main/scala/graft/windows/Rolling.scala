package graft.windows

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rolling time-window aggregates per group: for every row, aggregate
  * the rows of the same group whose timestamp lies in
  * `[t − window, t]` (event-time trailing window, endpoints closed).
  *
  * The reference's rolling surface is `roll1d` + the shift/compare
  * helpers (`misc.py:981-1116`) — positional shifts; a TIME-range
  * rolling agg is what its consumers build from them, so the engine
  * exposes it directly. Expressed as a Spark range-frame window, which
  * DuckDB mirrors with `RANGE BETWEEN ... PRECEDING AND CURRENT ROW`.
  *
  * Scale posture: one shuffle on the group keys, then a single
  * spillable per-partition Tungsten sort shared by every requested
  * aggregate (one Window operator, N expressions). The frame is
  * value-based, so rows with equal timestamps agree on their result
  * regardless of sort tie order — deterministic without a tiebreak
  * column. No join, no state, no driver collection.
  */
object Rolling {

  /** Adds one column per requested aggregate, named `roll_<agg>`.
    * `window` is in MICROSECONDS of event time (`timeCol` must be a
    * timestamp); `aggs` ⊆ {count, sum, mean, min, max}. `count` counts
    * non-null values, like pandas `rolling(...).count()`.
    */
  def timeWindow(df: DataFrame, groupBy: Seq[String], timeCol: String,
                 valueCol: String, window: Long,
                 aggs: Seq[String]): DataFrame = {
    require(groupBy.nonEmpty, "rolling windows need group keys (one sort per group)")
    require(window >= 0, "window must be non-negative")
    require(aggs.nonEmpty, "no aggregates requested")

    // NTZ timestamps go through a session-TZ cast (identity under the
    // engine's UTC default); relative differences are all the frame uses
    val micros = df.schema(timeCol).dataType match {
      case org.apache.spark.sql.types.TimestampNTZType =>
        unix_micros(col(timeCol).cast(org.apache.spark.sql.types.TimestampType))
      case _ => unix_micros(col(timeCol))
    }
    val w = Window
      .partitionBy(groupBy.map(col): _*)
      .orderBy(micros)
      .rangeBetween(-window, 0)
    val v = col(valueCol)

    val withAggs: Seq[(String, Column)] = aggs.map {
      case "count" => "roll_count" -> count(v).over(w)
      case "sum"   => "roll_sum"   -> sum(v).over(w)
      case "mean"  => "roll_mean"  -> avg(v).over(w)
      case "min"   => "roll_min"   -> min(v).over(w)
      case "max"   => "roll_max"   -> max(v).over(w)
      case other   => throw new IllegalArgumentException(s"unknown rolling agg: $other")
    }
    withAggs.foldLeft(df) { case (d, (name, c)) => d.withColumn(name, c) }
  }

  /** Positional rolling aggregates — pandas `rolling(window=k)`: the
    * last `k` rows (current included) per group in `orderBy` order. The
    * reference's `roll1d`/shift helpers (`misc.py:981-1116`) are the
    * 1-step special case.
    *
    * Unlike [[timeWindow]]'s value-based frame, a ROWS frame depends on
    * the total order, so `orderBy` must be a deterministic total order
    * within each group (include a unique tiebreak column — ties would
    * otherwise make results partitioning-dependent).
    *
    * `minPeriods` mirrors pandas: rows whose frame holds fewer than
    * `minPeriods` non-null values yield null (pandas default = window
    * size; pass 1 for "emit from the first row").
    */
  def rowWindow(df: DataFrame, groupBy: Seq[String], orderBy: Seq[String],
                valueCol: String, k: Int, aggs: Seq[String],
                minPeriods: Int = 1): DataFrame = {
    require(groupBy.nonEmpty, "rolling windows need group keys")
    require(k >= 1, "window must hold at least one row")
    require(minPeriods >= 1 && minPeriods <= k, "need 1 <= minPeriods <= k")
    require(orderBy.nonEmpty, "ROWS frames need an explicit total order")
    require(aggs.nonEmpty, "no aggregates requested")

    val w = Window
      .partitionBy(groupBy.map(col): _*)
      .orderBy(orderBy.map(col(_).asc): _*)
      .rowsBetween(-(k - 1).toLong, 0)
    val v = col(valueCol)
    val enough = count(v).over(w) >= minPeriods

    val withAggs: Seq[(String, Column)] = aggs.map {
      case "count" => "roll_count" -> count(v).over(w)
      case "sum"   => "roll_sum"   -> when(enough, sum(v).over(w))
      case "mean"  => "roll_mean"  -> when(enough, avg(v).over(w))
      case "min"   => "roll_min"   -> when(enough, min(v).over(w))
      case "max"   => "roll_max"   -> when(enough, max(v).over(w))
      case other   => throw new IllegalArgumentException(s"unknown rolling agg: $other")
    }
    withAggs.foldLeft(df) { case (d, (name, c)) => d.withColumn(name, c) }
  }
}
