package graft.agg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.SketchFunctions

/** Bottom-k-by-hash quantile sketch: a bounded, mergeable, DETERMINISTIC
  * alternative to exact per-group percentiles for corpus-scale profiling
  * (per-source length/quality distributions, per-host score spreads).
  *
  * The sample: each row gets a uniform 60-bit md5 rank of its IDENTITY
  * column; the k lowest-ranked rows of a group are a simple random
  * sample without replacement, so the sample's empirical quantiles
  * estimate the group's with error ~1/√k — and, unlike exact
  * percentiles, the aggregate's partial state is ≤ k (rank, value)
  * pairs per group per task at ANY group size ([[org.apache.spark.sql.graft.MinKPairs]];
  * Spark's exact `percentile` buffers every value, the object-hash
  * memory cliff the engine avoids everywhere).
  *
  * Mergeable: the k smallest ranks of A ∪ B are computable from the k
  * smallest of A and of B, so slice sketches (daily, per partition)
  * union LOSSLESSLY to the single-pass whole-corpus sketch — same
  * contract as [[DistinctSketch]], proven against the oracle by the
  * merge driver query. Groups with ≤ k rows are EXACT (the sample is
  * the whole group).
  *
  * Deterministic: md5 ranks, no seed, no partition-order dependence —
  * the DuckDB oracle reproduces every estimate bit-for-bit.
  */
object QuantileSketch {

  /** Per-group sketch: `groupCols*, qsk: array<struct<rank,value>>`
    * (sorted by rank, ≤ k entries). `idCol` must identify rows uniquely
    * (rank collisions collapse to one sample point).
    */
  def sketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
             idCol: Column, k: Int = 256): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(SketchFunctions.min_k_pairs(
        DistinctSketch.hash60(idCol),
        col(valueCol).cast("double"), k).as("qsk"))

  /** Lossless union of two sketch arrays built with the same k: the k
    * entries with smallest rank across both (rank ties keep the smaller
    * value — mirrors the aggregate's collision rule).
    */
  def unionSketch(a: Column, b: Column, k: Int): Column =
    slice(array_sort(concat(a, b)), 1, k)

  /** Quantile estimate from a sketch column: empirical quantile of the
    * sampled values with linear interpolation (percentile_cont
    * convention). Fixed IEEE operation order — engine-reproducible.
    */
  def quantile(qsk: Column, q: Double): Column = {
    val vals = array_sort(transform(qsk, s => s.getField("value")))
    val n = size(vals)
    val pos = lit(q) * (n - 1).cast("double")
    val lo = floor(pos).cast("int")
    val frac = pos - lo.cast("double")
    when(n === 0, lit(null).cast("double"))
      .when(n === 1, element_at(vals, 1))
      .otherwise(
        element_at(vals, lo + 1) * (lit(1.0) - frac) +
          element_at(vals, least(lo + lit(2), n)) * frac)
  }
}
