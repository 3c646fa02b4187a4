package graft.agg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan, J.Alg'05): fixed-size
  * frequency summaries for heavy-hitter estimation over unbounded key
  * spaces (token counts, URL hits, user event counts) at corpus scale.
  *
  * Not in the reference (pandas `value_counts` is exact and single-
  * machine) — the scale rationale: an exact per-key count over a 100 TB
  * corpus shuffles one row per distinct key; the sketch aggregates to a
  * FIXED d×w grid (e.g. 4×1024 cells) with map-side combine, so the
  * shuffle is bounded by the grid, not the vocabulary. Counts are
  * additive and commutative, so sketches from corpus slices / streaming
  * micro-batches merge by cell-wise sum, and the same update works as a
  * stateless projection + windowed agg on a stream.
  *
  * The d row-hashes are md5-derived (depth salt ‖ key) — deterministic,
  * seedless, engine-portable: the DuckDB oracle reproduces every cell
  * and every estimate exactly. Estimate = min over the d cells a key
  * maps to; always an OVER-estimate (collisions only add), with
  * ε ≈ e/w overcount probability δ ≈ e^−d (standard CM bounds).
  */
object CountMin {

  /** Cell index of `key` on hash row `depth`: uniform 60-bit md5 hash of
    * `"<depth>#<key>"` mod `width`. DuckDB spelling:
    * `('0x' || substring(md5(depth || '#' || key), 1, 15))::BIGINT % width`.
    */
  def bucket(key: Column, depth: Column, width: Int): Column =
    conv(substring(md5(concat(depth.cast("string"), lit("#"),
        key.cast("string")).cast("binary")), 1, 15), 16, 10)
      .cast("long") % width

  /** Build the sketch: one row per non-empty cell,
    * `(depth: int, bucket: long, cnt: long)`, `depth` ∈ [0, d).
    * `weight` defaults to 1 per input row (plain counting); pass e.g. a
    * token count to sketch token-weighted frequencies.
    */
  def sketch(df: DataFrame, keyCol: String, depth: Int = 4,
             width: Int = 1024, weight: Column = lit(1L)): DataFrame = {
    require(depth >= 1 && width >= 2, s"bad sketch shape d=$depth w=$width")
    df.select(col(keyCol).as("__graft_key"), weight.as("__graft_w"))
      .where(col("__graft_key").isNotNull)
      // d replicas per row; the groupBy below collapses them to ≤ d·w
      // cells via partial aggregation, so the exploded rows never shuffle
      .select(explode(sequence(lit(0), lit(depth - 1))).as("depth"),
        col("__graft_key"), col("__graft_w"))
      .groupBy(col("depth"),
        bucket(col("__graft_key"), col("depth"), width).as("bucket"))
      .agg(sum(col("__graft_w")).as("cnt"))
  }

  /** Point-estimate counts for `keys` (a one-column frame of distinct
    * keys): `(key, cms_est)`. The sketch is ≤ d·w rows — broadcast it;
    * the keys side stays partitioned, so estimating any number of keys
    * is one stateless broadcast join + a d-way grouped min.
    */
  def estimate(sketch: DataFrame, keys: DataFrame, keyCol: String,
               depth: Int = 4, width: Int = 1024): DataFrame = {
    val probes = keys
      .select(col(keyCol))
      .where(col(keyCol).isNotNull).distinct()
      .select(col(keyCol),
        explode(sequence(lit(0), lit(depth - 1))).as("depth"))
      .withColumn("bucket", bucket(col(keyCol), col("depth"), width))
    // left join: a cell no key ever incremented is absent from the
    // sketch frame — its count is 0, and min(0, ...) = 0 is correct
    probes
      .join(broadcast(sketch), Seq("depth", "bucket"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
  }

  /** Merge sketches built with the same (depth, width): cell-wise sum. */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("depth", "bucket")
      .agg(sum("cnt").as("cnt"))
}
