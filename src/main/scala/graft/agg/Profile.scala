package graft.agg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset profiling + join-key skew diagnostics — the observability
  * step of a large-scale pipeline (what a data engineer runs BEFORE
  * choosing a partition strategy, a salt factor, or a broadcast side).
  *
  * Two surfaces:
  *  - [[columns]]: per-column null count / exact distinct count / min /
  *    max, computed as a UNION of k single-column aggregates — one
  *    column-pruned scan per profiled column. That shape deliberately
  *    beats the one-pass multi-distinct aggregate: multi-distinct plans
  *    an `expand` that multiplies every scanned row k× and falls back to
  *    SortAggregate for string min/max buffers (measured 4× slower),
  *    while each union branch reads ONLY its own column from a columnar
  *    source. Pass `approxDistinct = true` to swap in HyperLogLog
  *    `approx_count_distinct` at 100 TB.
  *  - [[keySkew]]: the top-k heaviest keys of a prospective join/groupBy
  *    column with their frequency share — the number that decides
  *    between a plain shuffle join, `graft.joins.SaltedJoin`, and AQE
  *    skew splitting. One map-side-combined `groupBy(key)` plus a
  *    top-k (TakeOrderedAndProject — per-partition heaps, no global
  *    sort) against a 1-row total broadcast.
  */
object Profile {

  /** One row per profiled column:
    * `(column, n_rows, n_nulls, n_distinct, min_str, max_str)`.
    * min/max are rendered as strings so heterogeneous column types fit
    * one output schema (profiles are small human-facing frames; the
    * casts happen AFTER aggregation, on k rows).
    */
  def columns(df: DataFrame, cols: Seq[String],
              approxDistinct: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "Profile.columns needs at least one column")
    // one aggregate per column, unioned: with a columnar source each
    // branch scans ONLY its column (pruned read), and a single-column
    // distinct plans as a plain two-phase aggregate — the one-frame
    // multi-distinct alternative expands the scan k× and falls back to
    // SortAggregate for string min/max buffers (measured 4× slower)
    val perCol = cols.map { c =>
      df.select(col(c)).agg(
        count(lit(1)).as("n_rows"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_nulls"),
        (if (approxDistinct) approx_count_distinct(col(c))
         else count_distinct(col(c))).as("n_distinct"),
        min(col(c)).cast("string").as("min_str"),
        max(col(c)).cast("string").as("max_str"))
        .select(lit(c).as("column"), col("n_rows"), col("n_nulls"),
          col("n_distinct"), col("min_str"), col("max_str"))
    }
    perCol.reduce(_ unionByName _)
  }

  /** Top-k heaviest values of `keyCol` with absolute counts and the
    * fraction of all rows they cover: `(keyCol, cnt, share)`. Ties break
    * by key value ascending (deterministic). Null keys count as a value —
    * a skewed null is the single most common real-world skew.
    */
  def keySkew(df: DataFrame, keyCol: String, k: Int = 20): DataFrame = {
    require(k > 0, "k must be positive")
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
    val total = df.agg(count(lit(1)).as("__total"))
    counts
      .orderBy(col("cnt").desc, col(keyCol).asc_nulls_first)
      .limit(k)
      .crossJoin(broadcast(total))
      .select(col(keyCol), col("cnt"),
        (col("cnt").cast("double") / col("__total")).as("share"))
  }
}
