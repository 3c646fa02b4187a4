package graft.resample

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative window builder — Spark-native counterpart of the reference's
  * `make_windows` (`/root/reference/catabra_pandas/resampling.py:791-1083`).
  *
  * Each endpoint of the produced windows can be given
  *   - absolutely (`start` / `stop` column expressions),
  *   - relative to an `anchor` expression (`startRel` / `stopRel`, added to
  *     the anchor), or
  *   - derived from the opposite endpoint via `duration`.
  *
  * The reference additionally accepts `eval`-strings over the source frame
  * (`resampling.py:800-806`); here every parameter is already a [[Column]]
  * expression, which subsumes string-eval safely (SURVEY.md §2.8).
  *
  * The result is a plain windows DataFrame `(entity?, win_start?, win_stop?)`
  * ready for [[ResampleEav]] / [[ResampleInterval]]; a missing endpoint means
  * ±∞ for every window.
  */
final case class MakeWindows(
    entity: Option[Column] = None,
    start: Option[Column] = None,
    stop: Option[Column] = None,
    startRel: Option[Column] = None,
    stopRel: Option[Column] = None,
    anchor: Option[Column] = None,
    duration: Option[Column] = None) {

  require(start.isEmpty || startRel.isEmpty, "start and startRel are exclusive")
  require(stop.isEmpty || stopRel.isEmpty, "stop and stopRel are exclusive")
  require(startRel.isEmpty && stopRel.isEmpty || anchor.isDefined,
    "startRel/stopRel require an anchor")

  /** Resolved start/stop expressions, before duration completion. */
  private def startExpr: Option[Column] =
    start.orElse(startRel.map(r => anchor.get + r))
  private def stopExpr: Option[Column] =
    stop.orElse(stopRel.map(r => anchor.get + r))

  /** Build the windows frame from a source DataFrame (e.g. the frame being
    * resampled, mirroring `resampling.py:170-173` lazy evaluation).
    */
  def apply(df: DataFrame): DataFrame = {
    val (s, t) = (startExpr, stopExpr) match {
      case (Some(a), Some(b)) =>
        // the reference rejects an over-specified window (both endpoints
        // AND a duration, test_make_windows.py:118-124) rather than
        // silently ignoring one of the three
        require(duration.isEmpty,
          "duration is exclusive with giving both endpoints")
        (Some(a), Some(b))
      case (Some(a), None) =>
        (Some(a), duration.map(d => a + d))
      case (None, Some(b)) =>
        (duration.map(d => b - d), Some(b))
      case (None, None) =>
        throw new IllegalArgumentException("at least one endpoint required")
    }
    val cols =
      entity.map(_.as("entity")).toSeq ++
      s.map(_.as("win_start")).toSeq ++
      t.map(_.as("win_stop")).toSeq
    df.select(cols: _*)
  }
}
