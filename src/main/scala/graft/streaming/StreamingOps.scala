package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming variants of the engine's core operators.
  *
  * The reference is batch-only (SURVEY.md §1.1: no streaming surface), so
  * none of this is parity — it is the natural extension SURVEY.md §7
  * notes: a 100 TB training-data pipeline ingests events continuously,
  * and the same declarative plans run incrementally under watermarks.
  * Each function takes/returns a streaming DataFrame (`readStream` in,
  * `writeStream` out is the caller's concern), so they compose with the
  * batch operators that are expressible in append/update modes.
  */
object StreamingOps {

  /** Streaming analog of `group_intervals` on point events: per-entity
    * session windows with inactivity gap `gap` — events closer than the
    * gap coalesce into one session, exactly single-linkage clustering
    * with `distance = gap` over degenerate (point) intervals
    * (`misc.py:125-257`). Spark's `session_window` maintains the merge
    * state incrementally; the watermark bounds it.
    *
    * @return entity, session_start, session_stop, n_events, v_sum
    */
  def sessionize(
      events: DataFrame,
      timeCol: String,
      entityCol: String,
      valueCol: String,
      gap: String,
      watermark: String): DataFrame =
    events
      .withWatermark(timeCol, watermark)
      .groupBy(col(entityCol), session_window(col(timeCol), gap).as("w"))
      .agg(count(lit(1)).as("n_events"), sum(col(valueCol)).as("v_sum"))
      .select(col(entityCol),
        col("w.start").as("session_start"), col("w.end").as("session_stop"),
        col("n_events"), col("v_sum"))

  /** Streaming fast path of `resample_eav` for REGULAR tumbling/sliding
    * windows (the `window()` bucketing SURVEY.md §2.9 identifies): per
    * (entity, attribute, window) aggregation with a watermark for state
    * eviction. Irregular explicit windows need the batch operator — a
    * stream-batch interval join is not expressible incrementally without
    * a state-store operator.
    *
    * @param obs       streaming frame with `timeCol` (event time),
    *                  `entityCol`, `attrCol`, `valueCol`
    * @param watermark max event-time lateness, e.g. "10 minutes"
    * @param windowDur tumbling window duration, e.g. "1 hour"
    * @param slide     optional slide (sliding windows when ≠ windowDur)
    * @return columns: entity, attribute, win_start, win_stop, n, v_sum,
    *         v_min, v_max, v_avg (count-like semantics match the batch
    *         operator: counts of non-null values)
    */
  def resampleEavRegular(
      obs: DataFrame,
      timeCol: String,
      entityCol: String,
      attrCol: String,
      valueCol: String,
      watermark: String,
      windowDur: String,
      slide: Option[String] = None): DataFrame = {
    val w = slide match {
      case Some(s) => window(col(timeCol), windowDur, s)
      case None    => window(col(timeCol), windowDur)
    }
    obs
      .withWatermark(timeCol, watermark)
      .groupBy(col(entityCol), col(attrCol), w.as("win"))
      .agg(
        count(col(valueCol)).as("n"),
        sum(col(valueCol)).as("v_sum"),
        min(col(valueCol)).as("v_min"),
        max(col(valueCol)).as("v_max"),
        avg(col(valueCol)).as("v_avg"))
      .select(col(entityCol), col(attrCol),
        col("win.start").as("win_start"), col("win.end").as("win_stop"),
        col("n"), col("v_sum"), col("v_min"), col("v_max"), col("v_avg"))
  }

  /** Streaming exact dedup: keep the first occurrence of each key within
    * the watermark horizon (`dropDuplicates` keyed state, evicted by the
    * event-time watermark — the streaming analog of
    * [[graft.dedup.ExactDedup.survivors]]).
    */
  def streamingExactDedup(
      df: DataFrame,
      keyCols: Seq[String],
      timeCol: String,
      watermark: String): DataFrame =
    df.withWatermark(timeCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Streaming interval-containment enrichment: join a stream of points
    * against a STATIC intervals table (broadcast dimension) — the
    * streaming analog of `find_containing_interval` for slowly-changing
    * interval dimensions (e.g. per-user sessions, campaign windows).
    * Stream-static joins need no watermark; the static side re-resolves
    * per micro-batch.
    */
  def pointsInStaticIntervals(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      on: Seq[String],
      startCol: String,
      stopCol: String): DataFrame = {
    val iPrefix = "__graft_i_"
    val ivR = intervals.columns.foldLeft(intervals)(
      (d, c) => d.withColumnRenamed(c, iPrefix + c))
    val cond = on.map(k => col(k) === col(iPrefix + k))
      .reduceOption(_ && _).getOrElse(lit(true)) &&
      col(iPrefix + startCol) <= col(pointCol) &&
      col(pointCol) <= col(iPrefix + stopCol)
    points.join(broadcast(ivR), cond, "left")
  }
}
