package graft.sample

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.Shingles

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * public): select raw-corpus documents whose hashed-n-gram distribution
  * looks like a small in-domain target corpus. The standard recipe for
  * "give me web data that reads like Wikipedia/books/code" when training
  * data is curated at scale; the reference library has no selection
  * surface at all, so this fills the gap Spark-first.
  *
  * Method: unigrams + bigrams are hashed into `buckets` cells; target
  * and raw corpora each fit a smoothed bag-of-buckets model; a raw
  * document's importance weight is
  * `log w(x) = Σ_b c_x[b]·(ln p̂_target[b] − ln p̂_raw[b])`, and
  * resampling takes the Gumbel top-k by `log w + g`, `g = −ln(−ln u)` —
  * which samples WITHOUT replacement proportionally to `w` (Gumbel-max
  * trick). `u` comes from the engine-portable 60-bit md5 rank
  * ([[Sampling.md5Rank]]), so selection is deterministic in `seed` and
  * reproducible in any engine with md5 — which is how the DuckDB oracle
  * checks it exactly.
  *
  * Scale posture: the feature stream is a stateless per-row explode
  * (no windows); per-corpus bucket models are hash aggregations with
  * map-side combine whose size is ≤ `buckets` rows — BROADCAST joins
  * back onto the per-document feature stream regardless of corpus size;
  * totals are 1-row broadcasts; per-document weights are one more
  * map-side-combinable aggregation; top-k is Spark's distributed
  * TakeOrdered. Nothing in the plan grows super-linearly with the raw
  * corpus, and nothing shuffles the text itself after tokenization.
  */
object Dsir {

  /** 60-bit md5 bucket of an n-gram — DuckDB-reproducible as
    * `('0x' || substring(md5('dsir#' || g), 1, 15))::BIGINT % buckets`.
    */
  private def bucketOf(g: Column, buckets: Int): Column =
    conv(substring(md5(concat(lit("dsir#"), g).cast("binary")), 1, 15),
      16, 10).cast("long") % buckets

  /** Per-document hashed n-gram counts: `(_did, _b, _c)`. */
  private def features(df: DataFrame, idCol: String, textCol: String,
                       buckets: Int, bigrams: Boolean): DataFrame = {
    val tk = Shingles.tokens(col(textCol))
    val grams =
      if (bigrams)
        concat(tk, coalesce(when(size(tk) >= 2,
          zip_with(slice(tk, lit(1), size(tk) - 1),
            slice(tk, lit(2), size(tk) - 1),
            (a, b) => concat(a, lit(" "), b))),
          array().cast("array<string>")))
      else tk
    df.select(col(idCol).as("_did"), explode(grams).as("_g"))
      .select(col("_did"), bucketOf(col("_g"), buckets).as("_b"))
      .groupBy("_did", "_b").agg(count(lit(1)).as("_c"))
  }

  /** `(idCol, n_feats, log_weight)` for every raw document with ≥ 1
    * token. `k` is the add-k bucket smoothing of both models.
    */
  def importanceWeights(raw: DataFrame, target: DataFrame,
                        idCol: String, textCol: String,
                        buckets: Int = 2048, k: Double = 1.0,
                        bigrams: Boolean = true): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    require(k > 0, "smoothing k must be positive")
    // Pinned (guide §1.2 step 1): the raw feature stream feeds its
    // bucket model AND the weight stream below — unpinned, the whole
    // tokenize/bigram/md5-bucket pipeline ran once per reference, and
    // the two corpus totals each re-ran it a THIRD/FOURTH time. The
    // totals are instead derived from the (≤ `buckets`-row, pinned)
    // bucket models — Σ_b Σ_doc c = Σ c exactly, same add-k arithmetic
    // downstream; an empty corpus still yields 0 through the coalesce.
    val rf = features(raw, idCol, textCol, buckets, bigrams)
      .localCheckpoint(false)
    val tf = features(target, idCol, textCol, buckets, bigrams)
    val tAgg = tf.groupBy("_b").agg(sum("_c").as("_tc"))
      .localCheckpoint(false)
    val rAgg = rf.groupBy("_b").agg(sum("_c").as("_rc"))
      .localCheckpoint(false)
    val tTot = tAgg.agg(coalesce(sum("_tc"), lit(0L)).as("_tt"))
    val rTot = rAgg.agg(coalesce(sum("_rc"), lit(0L)).as("_rt"))
    rf
      .join(broadcast(tAgg), Seq("_b"), "left")
      .join(broadcast(rAgg), Seq("_b"), "left")
      .crossJoin(broadcast(tTot)).crossJoin(broadcast(rTot))
      .select(col("_did"), col("_c"),
        (col("_c") *
          (log((coalesce(col("_tc"), lit(0L)) + k) /
               (col("_tt") + k * buckets)) -
           log((coalesce(col("_rc"), lit(0L)) + k) /
               (col("_rt") + k * buckets)))).as("_w"))
      .groupBy(col("_did").as(idCol))
      .agg(sum(col("_c")).as("n_feats"), sum(col("_w")).as("log_weight"))
  }

  /** Gumbel top-`n` resample of `raw` by importance weight —
    * `(idCol, n_feats, log_weight)`, the selected documents. */
  def resample(raw: DataFrame, target: DataFrame,
               idCol: String, textCol: String, n: Int,
               seed: Long = 42L,
               buckets: Int = 2048, k: Double = 1.0,
               bigrams: Boolean = true): DataFrame = {
    require(n > 0, "n must be positive")
    val w = importanceWeights(raw, target, idCol, textCol, buckets, k, bigrams)
    // u ∈ (0,1) from the 60-bit md5 rank; Gumbel g = −ln(−ln u)
    val u = (Sampling.md5Rank(col(idCol), seed).cast("double") + 1.0) /
      lit(1152921504606846977.0) // 2^60 + 1
    w.withColumn("_key", col("log_weight") - log(-log(u)))
      .orderBy(col("_key").desc, col(idCol))
      .limit(n)
      .drop("_key")
  }
}
