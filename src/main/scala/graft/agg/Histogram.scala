package graft.agg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group histograms and quantile binning — the distribution probes a
  * curation pipeline runs before thresholding (keep docs above the
  * per-language p25 quality score, inspect the length distribution per
  * source, etc.). The reference stops at scalar aggregates; these are the
  * natural grouped extensions.
  *
  * Scale posture: `equalWidth` is two aggregations — a tiny per-group
  * (min, max) frame that broadcast-joins back onto the rows, then the
  * (group, bin) count with map-side combine; nothing beyond group
  * cardinality ever sits on one node. `quantileBins` is one window pass
  * (`ntile` over the group partition) plus a (group, bin) aggregation;
  * determinism under value ties comes from the caller's tie-break
  * column.
  */
object Histogram {

  /** Equal-width histogram of `valueCol` per `groupBy` group: `bins`
    * buckets spanning [group min, group max], bin index
    * `least(floor((x − mn) · bins / (mx − mn)), bins−1)` (the max value
    * folds into the last bin; a constant group collapses to bin 0).
    * Null values are dropped. Returns one row per non-empty
    * (group, bin): `bin`, `n`, `lo`, `hi` (the bin's value bounds).
    *
    * The per-group (min, max) frame is FORCE-broadcast: a histogram's
    * group count is human-scale by construction (someone reads one
    * histogram per group). If the group cardinality is itself
    * data-scale, a broadcast of it is wrong no matter the operator —
    * aggregate to scalars per group instead.
    */
  def equalWidth(df: DataFrame, valueCol: String, groupBy: Seq[String],
                 bins: Int): DataFrame = {
    require(bins > 0, "bins must be positive")
    val rows = df.filter(col(valueCol).isNotNull)
    val stats = rows.groupBy(groupBy.map(col): _*)
      .agg(min(col(valueCol)).as("__mn"), max(col(valueCol)).as("__mx"))
    val binned = rows.join(broadcast(stats), groupBy)
      .withColumn("bin",
        when(col("__mx") === col("__mn"), lit(0L))
          .otherwise(least(
            floor((col(valueCol) - col("__mn")) * bins / (col("__mx") - col("__mn"))),
            lit(bins - 1L))).cast("long"))
    binned.groupBy((groupBy :+ "bin").map(col): _*)
      .agg(count(lit(1)).as("n"),
        min(col(valueCol)).as("lo"), max(col(valueCol)).as("hi"))
  }

  /** Quantile bins: each row's `ntile(k)` bucket (1-based) ordered by
    * `valueCol` with `tieBreak` deciding order among equal values, plus
    * per-bucket count and value bounds. Equal-count buckets (±1 row),
    * the grouped form of "split by quartile".
    */
  def quantileBins(df: DataFrame, valueCol: String, tieBreak: String,
                   groupBy: Seq[String], k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val w = Window.partitionBy(groupBy.map(col): _*)
      .orderBy(col(valueCol), col(tieBreak))
    df.filter(col(valueCol).isNotNull)
      .withColumn("bucket", ntile(k).over(w))
      .groupBy((groupBy :+ "bucket").map(col): _*)
      .agg(count(lit(1)).as("n"),
        min(col(valueCol)).as("lo"), max(col(valueCol)).as("hi"))
  }
}
