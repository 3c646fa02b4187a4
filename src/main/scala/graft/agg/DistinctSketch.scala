package graft.agg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.SketchFunctions

/** KMV (k-minimum-values) distinct-count sketch: a bounded, mergeable,
  * DETERMINISTIC alternative to `count_distinct` for ultra-high-
  * cardinality profiling (distinct users per day, vocabulary per
  * source, distinct URLs per host) at corpus scale.
  *
  * Not in the reference (pandas `nunique` is exact and single-machine;
  * cf. `/root/reference/catabra_pandas/resampling.py` "nunique" agg) —
  * this extends the engine the way a 100 TB profiling pass needs:
  * `count_distinct`'s partial state is the distinct set itself, so a
  * column with billions of distinct values shuffles billions of rows;
  * the KMV state is ≤ k longs per group per task regardless of
  * cardinality, map-side combined, and sketches taken over different
  * corpus slices UNION losslessly (the k smallest distinct hashes of
  * A ∪ B are computable from the k smallest of A and of B) — so daily
  * sketches roll up to monthly ones without rescanning.
  *
  * Everything is deterministic: the hash is md5-derived (no seed, no
  * partition-order dependence), so results are reproducible across
  * engines — the DuckDB oracle reproduces estimates bit-for-bit.
  *
  * Estimator (Beyer et al., SIGMOD'07): with u_k = the k-th smallest of
  * n distinct uniform 60-bit hashes, E[(k-1) · 2^60 / u_k] = n, with
  * relative error ~ 1/√(k−2) (k = 256 → ~6%). Groups with < k distinct
  * values are EXACT (the sketch holds every hash; the estimate is its
  * size).
  */
object DistinctSketch {

  /** Uniform 60-bit non-negative hash of any column, identical to the
    * engine-portable recipe used across graft (md5 → first 15 hex
    * digits): DuckDB spelling
    * `('0x' || substring(md5(x), 1, 15))::BIGINT`.
    */
  def hash60(c: Column): Column =
    conv(substring(md5(c.cast("string").cast("binary")), 1, 15), 16, 10)
      .cast("long")

  /** Per-group sketch: `groupCols* , kmv: array<long>` (sorted, ≤ k). */
  def sketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
             k: Int = 256): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(SketchFunctions.min_k_longs(hash60(col(valueCol)), k).as("kmv"))

  /** Distinct-count estimate from a sketch column produced with this k.
    * Exact below k; (k-1)·2^60/u_k at and above. Double math in a fixed
    * operation order — reproducible bit-for-bit in any IEEE engine.
    */
  def estimate(kmv: Column, k: Int): Column =
    when(size(kmv) < k, size(kmv).cast("double"))
      .otherwise(
        lit((k - 1).toDouble) * lit(1152921504606846976.0) /
          element_at(kmv, k).cast("double"))

  /** Lossless union of two sketch arrays built with the same k: the k
    * smallest distinct of the concatenation. `array_union` dedups.
    */
  def unionSketch(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_union(a, b)), 1, k)

  /** End-to-end: per-group approximate distinct count of `valueCol`. */
  def approxDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
                     k: Int = 256): DataFrame =
    sketch(df, groupCols, valueCol, k)
      .withColumn("n_distinct_est", estimate(col("kmv"), k))
      .drop("kmv")
}
