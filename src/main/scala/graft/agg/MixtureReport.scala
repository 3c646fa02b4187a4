package graft.agg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-mixture report: multi-level corpus composition in ONE pass —
  * per (lang × source) cell, per-lang subtotal, and the grand total,
  * each with document counts, weight sums, and share-of-corpus. The
  * report every training-data pipeline publishes next to its corpus
  * ("how much German web text vs English code, and what fraction of
  * the token budget is each slice").
  *
  * Spark-first: `rollup`/`cube` plan as a single Expand + one
  * partially-aggregated exchange — the subtotals do NOT re-scan the
  * corpus per level (vs the naive union-of-groupbys, which scans once
  * per level). `grouping_id()` disambiguates subtotal rows from real
  * null dimension values, bit-compatible with ANSI `GROUPING(...)`.
  *
  * Share-of-corpus divides by the grand total via a 1-row broadcast
  * cross join (the PageRank/TfIdf scalar pattern) — no second scan, no
  * driver round-trip.
  */
object MixtureReport {

  /** @param dims     dimension columns, most-significant first
    * @param weightCol additive weight (chars, tokens, bytes); rows with
    *                  null weight count 0 weight
    * @param cube     full cube instead of rollup (all 2^d margins)
    */
  def apply(
      df: DataFrame,
      dims: Seq[String],
      weightCol: String,
      cube: Boolean = false): DataFrame = {
    require(dims.nonEmpty, "need at least one dimension")
    require((dims :+ weightCol).forall(df.columns.contains),
      "dims and weightCol must exist")

    val sets =
      if (cube) df.cube(dims.map(col): _*) else df.rollup(dims.map(col): _*)
    val report = sets.agg(
      grouping_id().as("level"),
      count(lit(1)).as("n_docs"),
      coalesce(sum(col(weightCol)), lit(0L)).as("weight"))

    val total = df.agg(
      count(lit(1)).as("__tot_docs"),
      coalesce(sum(col(weightCol)), lit(0L)).as("__tot_weight"))
    report.crossJoin(broadcast(total))
      .withColumn("doc_share",
        col("n_docs").cast("double") / col("__tot_docs"))
      .withColumn("weight_share",
        when(col("__tot_weight") =!= 0,
          col("weight").cast("double") / col("__tot_weight")))
      .drop("__tot_docs", "__tot_weight")
  }
}
