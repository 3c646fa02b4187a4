package graft.sample

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic negative sampling for contrastive training pairs —
  * for each query, `k` pseudo-random corpus rows that are NOT that
  * query's positives, reproducible under any partitioning and in any
  * engine (the md5-rank determinism contract of [[Sampling]]).
  *
  * Construction: every corpus id gets a uniform 60-bit md5 rank; every
  * (query, probe j) gets an independent uniform probe point in the same
  * space. Probe j's candidate is the corpus row "at" its point under a
  * BUCKETED nearest-below rule:
  *
  *   - the rank space is cut into `buckets` equal slices (ranks are
  *     uniform, so occupancy ≈ |corpus| / buckets — the scale lever:
  *     the probe↔corpus join is equi on the slice id and each probe
  *     scans one slice, never the corpus);
  *   - candidate = largest rank ≤ probe within the slice, wrapping to
  *     the slice's largest rank when the probe undercuts everything
  *     (so non-empty slices always yield); empty slices miss — the
  *     oversampling absorbs it.
  *
  * Positives are removed AFTER candidate draw (anti-join on the pair),
  * duplicates collapse to their smallest probe index, and the first
  * `k` surviving probes (by probe order) are emitted with a stable
  * `slot`. With `oversample` extra probes the result has exactly `k`
  * negatives per query w.h.p.; degenerate corpora (≲ k distinct
  * eligible ids) yield fewer — deterministically.
  *
  * 100 TB posture: corpus is ranked in one stateless pass; the only
  * shuffles are the slice-keyed equi-join, one per-probe window over
  * single-slice matches, and the per-query top-k (`WindowGroupLimit`
  * prunes below the sort). Nothing is quadratic; nothing collects.
  */
object Negatives {

  /** @param pairs      (queryCol, posCol) — positives to exclude; a
    *                   query may have many
    * @param corpus     candidate pool; `idCol` need not be distinct
    *                   (ranks collapse duplicates)
    * @param k          negatives wanted per query
    * @param buckets    rank-space slices (power of two); size so
    *                   |corpus|/buckets fits comfortably in a task
    * @param oversample extra probes beyond k to absorb positive hits,
    *                   duplicate draws, and empty slices
    */
  def apply(
      pairs: DataFrame,
      corpus: DataFrame,
      queryCol: String,
      posCol: String,
      idCol: String,
      k: Int,
      seed: Long = 7L,
      buckets: Int = 1 << 10,
      oversample: Int = 8): DataFrame = {
    require(k > 0, "k > 0")
    require(buckets > 0 && Integer.bitCount(buckets) == 1,
      "buckets must be a power of two")
    val shift = 60 - Integer.numberOfTrailingZeros(buckets)
    require(shift >= 0, "buckets must be <= 2^60")

    val ranked = corpus.select(col(idCol).as("__neg_id")).distinct()
      .withColumn("__neg_r", Sampling.md5Rank(col("__neg_id"), seed))
      .withColumn("__neg_b", shiftright(col("__neg_r"), shift))

    val nProbes = k + oversample
    val probes = pairs.select(col(queryCol).as("__neg_q")).distinct()
      .withColumn("__neg_j", explode(sequence(lit(0), lit(nProbes - 1))))
      .withColumn("__neg_p",
        conv(substring(md5(concat_ws("#", lit(seed), col("__neg_q"),
          col("__neg_j")).cast("binary")), 1, 15), 16, 10).cast("long"))
      .withColumn("__neg_b", shiftright(col("__neg_p"), shift))

    // candidate per probe: slice-local nearest-below, wrap to slice
    // max — as ONE `max_by` over the packed key `hit·2^62 + r` (prefer
    // ranks <= p, then the largest rank; ranks are md5-unique per
    // distinct id, so a key tie is a 60-bit collision — vanishing, and
    // the only case where the pick is not bit-pinned). Primitive
    // buffers keep this a HashAggregate with map-side partial combine:
    // the probe×slice join output reduces to one row per probe per
    // task BEFORE any shuffle. Both a rank window and a max-over-
    // struct aggregation (SortAggregate — struct buffers don't hash-
    // aggregate) SORTED the entire join output and took the sf1 bench
    // from seconds to minutes. The probe side is broadcast-small by
    // construction, so the slice join streams the corpus with full
    // scan parallelism.
    val packedKey =
      (col("__neg_r") <= col("__neg_p")).cast("long") * lit(1L << 62) +
        col("__neg_r")
    val candidates = probes
      .join(ranked, Seq("__neg_b"))
      .groupBy(col("__neg_q"), col("__neg_j"))
      .agg(max_by(col("__neg_id"), packedKey).as("__neg_id"))

    // drop the query's own positives, collapse duplicate draws to the
    // smallest probe index, emit the first k survivors in probe order
    val positives = pairs.select(col(queryCol).as("__neg_q"),
      col(posCol).as("__neg_id")).distinct()
    val wDedup = Window.partitionBy(col("__neg_q"), col("__neg_id"))
      .orderBy(col("__neg_j"))
    val wSlot = Window.partitionBy(col("__neg_q")).orderBy(col("__neg_j"))
    candidates
      .join(positives, Seq("__neg_q", "__neg_id"), "left_anti")
      .withColumn("__neg_dup", row_number().over(wDedup))
      .filter(col("__neg_dup") === 1)
      .withColumn("slot", row_number().over(wSlot))
      .filter(col("slot") <= k)
      .select(col("__neg_q").as(queryCol), col("__neg_id").as("neg_id"),
        col("slot").cast("long").as("slot"))
  }
}
