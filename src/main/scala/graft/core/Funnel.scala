package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Curation-funnel attrition report: given an ordered chain of gate
  * predicates, ONE corpus pass attributes every row to the FIRST gate
  * it fails (null predicate = fail, the quarantine convention) and
  * emits per-stage `entering / failed / surviving` counts — the
  * ops-level honesty instrument a multi-stage pipeline needs (a chain
  * that silently drops 40% at stage 3 should say so as a first-class
  * result, not a log line).
  *
  * Not in the reference (no pipeline surface there); standard practice
  * in public curation pipelines (e.g. the per-filter removal-rate
  * tables in the Gopher/RefinedWeb/Dolma papers — public knowledge).
  *
  * Scale posture: the corpus sees exactly ONE scan — the first-failing
  * stage index is a single nested CASE projection (codegen'd, no
  * shuffle), followed by a hash aggregation on that small integer.
  * Everything after operates on ≤ stages+1 rows: the cumulative
  * "entering" subtraction is a window over the (tiny, driver-bounded)
  * stage table, partitioned by a constant — bounded by the stage
  * count, never the corpus. Row-local predicates only by design:
  * gates that need a join (dedup canonicality, URL blocklists) belong
  * in the pipeline itself; give the funnel their precomputed flag
  * column.
  *
  * @param stages ordered (name, predicate) gates; names must be unique
  * @return one row per stage, in order: `(stage_idx, stage, entering,
  *         failed, surviving)` — `surviving` of the last stage is the
  *         pipeline's kept count
  */
object Funnel {

  /** First failing stage index of a row (`stages.length` = passed every
    * gate); null predicates FAIL their gate — quarantine, not
    * passthrough. A plain nested-CASE projection: stateless, so it
    * serves batch and streaming plans identically
    * ([[graft.streaming.StreamingOps.streamingFunnel]] groups it under
    * a watermarked window for the live attrition feed).
    */
  def firstFailStage(stages: Seq[(String, Column)]): Column = {
    require(stages.nonEmpty, "need at least one stage")
    stages.zipWithIndex.foldRight(lit(stages.length): Column) {
      case (((_, p), i), rest) =>
        when(!coalesce(p, lit(false)), lit(i)).otherwise(rest)
    }
  }

  def apply(df: DataFrame, stages: Seq[(String, Column)]): DataFrame = {
    require(stages.nonEmpty, "need at least one stage")
    require(stages.map(_._1).distinct.length == stages.length,
      "stage names must be unique")
    val spark = df.sparkSession
    import spark.implicits._
    val n = stages.length
    val counts = df.select(firstFailStage(stages).as("__ff"))
      .groupBy(col("__ff")).agg(count(lit(1)).as("__c"))
    // the stage table is literal and tiny; left join keeps zero-failure
    // stages visible. The windows below run on <= n rows partitioned by
    // a constant — stage-count-bounded, not corpus-bounded.
    // a sentinel row for the all-gates-passed bucket makes the math one
    // reverse-cumulative window: every row entering stage i either
    // fails at some j >= i or survives everything (the sentinel's
    // "failed"), so entering(i) = sum(failed) over rows i..n
    val stageLit = (stages.zipWithIndex
      .map { case ((name, _), i) => (i, name) } :+ (n -> "__graft_kept"))
      .toDF("stage_idx", "stage")
    val joined = stageLit
      .join(counts, col("stage_idx") === col("__ff"), "left")
      .withColumn("failed", coalesce(col("__c"), lit(0L)))
    val wFrom = Window.partitionBy(lit(1)).orderBy(col("stage_idx"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    joined
      .withColumn("entering", sum(col("failed")).over(wFrom))
      .withColumn("surviving", col("entering") - col("failed"))
      .filter(col("stage_idx") < n)
      .select(col("stage_idx"), col("stage"), col("entering"),
        col("failed"), col("surviving"))
  }
}
