package graft.joins

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.BloomMightContain

/** Bloom-filter join pruning: cut the big side of a selective join BEFORE
  * its shuffle.
  *
  * At cluster scale the dominant cost of `big ⋈ small` is shuffling `big`.
  * When the join is selective (most `big` rows match nothing), Spark's
  * options are a broadcast hash join (needs the WHOLE small side's rows on
  * every executor) or AQE's runtime row-level filtering (threshold-gated,
  * creation-side limits). This operator makes the pattern explicit and
  * unconditional:
  *
  *  1. aggregate the small side's join keys into a
  *     [[org.apache.spark.util.sketch.BloomFilter]] (one job over the
  *     small side; the filter is KB–MB regardless of row width),
  *  2. probe it in a pure projection-level `filter` on the big side — no
  *     shuffle, no broadcast relation build, runs inside whole-stage
  *     codegen via the native [[BloomMightContain]] expression,
  *  3. run the EXACT join on the survivors — false positives (bounded by
  *     `fpp`) are removed here, so results are exact; bloom filters have
  *     no false negatives, so no match is lost.
  *
  * Keys of any orderable type are supported: both sides hash through
  * `xxhash64`, so put/probe hashing agree by construction. Null keys never
  * match in SQL equi-joins; the exact join step enforces that (`xxhash64`
  * itself folds null to the seed, which only ever matters for the
  * probabilistic [[prefilter]], documented there).
  *
  * Reference context: the reference's `np.isin`-based two-sided semi-join
  * reduction before interval logic (`merging.py:314-323`) is this same
  * idea in single-machine form — prune non-joining rows before the
  * expensive phase; at 100 TB the bloom probe is the only shape of that
  * reduction that does not itself shuffle or broadcast row data.
  */
object BloomPrune {

  /** Build a bloom filter over `small`'s join keys (hashed to long). */
  private def build(small: DataFrame, smallKey: String, fpp: Double,
                    expectedKeys: Long): org.apache.spark.util.sketch.BloomFilter = {
    val keyed = small.filter(col(smallKey).isNotNull)
      .select(xxhash64(col(smallKey)).as("__graft_bk"))
    val n = if (expectedKeys > 0) expectedKeys
            // count, not countDistinct: an overestimate only lowers the
            // effective fpp (bigger filter), never correctness
            else math.max(keyed.count(), 1L)
    keyed.stat.bloomFilter("__graft_bk", n, fpp)
  }

  /** The probabilistic pre-filter alone: rows of `big` whose key MIGHT be
    * in `small`'s key set (false-positive rate ≈ `fpp`, no false
    * negatives). Useful when the consumer tolerates overshoot (e.g. a
    * staged pipeline that re-checks later); use [[semiJoin]]/[[join]] for
    * exact results. Rows with a null key are kept only if `small` has a
    * null key (xxhash64 folds null to its seed) — exact joins drop them
    * in the verify step regardless.
    */
  def prefilter(big: DataFrame, small: DataFrame, bigKey: String,
                smallKey: String, fpp: Double = 0.03,
                expectedKeys: Long = -1L): DataFrame = {
    val bloom = build(small, smallKey, fpp, expectedKeys)
    big.filter(BloomMightContain.column(xxhash64(col(bigKey)), bloom))
  }

  /** Exact left-semi join of `big` against `small`'s keys, bloom-pruned:
    * ≡ `big.join(small, bigKey === smallKey, "left_semi")`, but `big` is
    * cut to ~(matches + fpp·|big|) rows before any shuffle.
    */
  def semiJoin(big: DataFrame, small: DataFrame, bigKey: String,
               smallKey: String, fpp: Double = 0.03,
               expectedKeys: Long = -1L): DataFrame = {
    val pruned = prefilter(big, small, bigKey, smallKey, fpp, expectedKeys)
    // unique probe-side name: bigKey may equal smallKey
    val keys = small.select(col(smallKey).as("__graft_bpk")).distinct()
    pruned.join(keys, col(bigKey) === col("__graft_bpk"), "left_semi")
  }

  /** Exact inner/left-semi-shaped join with `small`'s columns attached,
    * bloom-pruned the same way. `how` ∈ inner | left_semi | left_anti.
    * (left/outer would need the pruned-away rows back — out of scope: the
    * technique exists to DROP non-matching rows early.)
    */
  def join(big: DataFrame, small: DataFrame, bigKey: String,
           smallKey: String, how: String = "inner", fpp: Double = 0.03,
           expectedKeys: Long = -1L): DataFrame = {
    require(Set("inner", "left_semi", "left_anti").contains(how),
      s"BloomPrune.join supports inner/left_semi/left_anti, got $how")
    how match {
      case "left_anti" =>
        // anti join needs the NON-matching rows — the bloom filter prunes
        // the wrong side for that; probe its complement instead. A bloom
        // false positive would here WRONGLY drop a non-matching row, so
        // anti joins route the maybe-matches through the exact join and
        // union the definite non-matches (bloom 'false' is definitive).
        val bloom = build(small, smallKey, fpp, expectedKeys)
        val probe = BloomMightContain.column(xxhash64(col(bigKey)), bloom)
        val definiteNo = big.filter(!probe || col(bigKey).isNull)
        val keys = small.select(col(smallKey).as("__graft_bpk")).distinct()
        val maybe = big.filter(probe && col(bigKey).isNotNull)
          .join(keys, col(bigKey) === col("__graft_bpk"), "left_anti")
        definiteNo.unionByName(maybe)
      case h =>
        val pruned = prefilter(big, small, bigKey, smallKey, fpp, expectedKeys)
        // frame-qualified key refs: bigKey may equal smallKey by name
        pruned.join(small, pruned(bigKey) === small(smallKey), h)
    }
  }
}
