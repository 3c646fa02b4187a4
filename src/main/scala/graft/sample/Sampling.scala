package graft.sample

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling utilities for training-data curation.
  *
  * `df.sample`/`sampleBy` draw BERNOULLI samples: the output size is
  * random (binomial), rows change with partitioning, and per-stratum
  * quotas ("exactly n docs per language") are not expressible. Curation
  * pipelines want exact quotas and reproducibility instead, so these
  * operators rank rows by a deterministic pseudo-random key — a hash of
  * (id, seed) — and cut at the quota:
  *
  *   sampled = row_number() over (partition by strata
  *                                order by hash(id, seed), id) <= n
  *
  * Properties at scale: the rank is a window over the strata partitions
  * (one shuffle on the strata key; skewed strata are bounded by the quota
  * cut, and `WindowGroupLimit` prunes each partition to its top-n before
  * the final sort); re-running with the same seed reproduces the exact
  * sample on any cluster layout, and growing n is MONOTONE — the n=1000
  * sample is a superset of the n=500 sample, which makes incremental
  * quota changes diff-friendly.
  *
  * The hash defaults to a 60-bit md5 prefix, not Murmur3/xxhash: md5 is
  * bit-identical in every engine, so a differential oracle (or a later
  * re-draw in another system) selects the same rows.
  */
object Sampling {

  /** 60-bit integer from the md5 of (seed, id) — engine-portable. */
  def md5Rank(id: Column, seed: Long): Column =
    conv(substring(md5(concat_ws("#", lit(seed), id).cast("binary")), 1, 15),
      16, 10).cast("long")

  /** Exactly `n` rows per stratum (fewer when the stratum is smaller),
    * deterministic in `seed`, monotone in `n`.
    *
    * @param strata  stratum key columns (e.g. language, source, label)
    * @param idCol   unique row id — the tie-break and hash input
    */
  def stratified(
      df: DataFrame,
      strata: Seq[String],
      idCol: String,
      n: Int,
      seed: Long = 42L): DataFrame = {
    require(n > 0, "n must be positive")
    val w = Window.partitionBy(strata.map(col): _*)
      .orderBy(md5Rank(col(idCol), seed).asc, col(idCol).asc)
    df.withColumn("__graft_rank", row_number().over(w))
      .filter(col("__graft_rank") <= n)
      .drop("__graft_rank")
  }

  /** Global exact-size sample: `stratified` with a single stratum. */
  def exact(df: DataFrame, idCol: String, n: Int, seed: Long = 42L): DataFrame =
    stratified(df.withColumn("__graft_one", lit(1)),
      Seq("__graft_one"), idCol, n, seed)
      .drop("__graft_one")

  /** The advisors' deterministic corpus sample
    * ([[graft.similarity.AnnAdvisor]], [[graft.dedup.LshAdvisor]]):
    * the md5-rank bottom `n` ids — BARE `md5(id::VARCHAR)`, the exact
    * spelling the DuckDB oracles replay — re-joined left-semi and
    * PINNED behind an eager checkpoint barrier. The barrier is
    * load-bearing twice over: (1) without it Catalyst pushes a
    * downstream expression filter (with the expression substituted in)
    * below the semi join onto the CORPUS side — measured 33 s vs 0.5 s
    * at sf1 when LshAdvisor's shingle filter migrated under the join;
    * (2) advisors re-consume the sample once per measured
    * configuration, and the pin keeps that from re-running the
    * corpus orderBy-limit per plan.
    */
  def md5RankPinned(df: DataFrame, idCol: String, n: Int): DataFrame = {
    require(n > 0, "n must be positive")
    val ids = df
      .select(col(idCol), md5(col(idCol).cast("string")).as("__graft_r"))
      .orderBy(col("__graft_r"), col(idCol))
      .limit(n)
      .select(col(idCol))
    df.join(ids, Seq(idCol), "left_semi").localCheckpoint(true)
  }

  /** Deterministic source-mixture rebalancing — the "data mixing" step of
    * a training-data pipeline: sample so the output approaches the target
    * stratum proportions. Stratum `s` keeps `floor(total · weight(s))`
    * rows (fewer when the stratum is smaller — the caller checks
    * feasibility against availability if the exact mixture is a hard
    * requirement); strata absent from `weights` are dropped. Selection is
    * the same engine-portable md5 rank as [[stratified]]: deterministic
    * in `seed`, stable under any partitioning, monotone in `total`.
    *
    * Scale note: per-stratum quotas arrive as a broadcast frame, so the
    * rank filter compares against a COLUMN — `WindowGroupLimit` cannot
    * prune early the way [[stratified]]'s literal cut allows; the
    * full sort per stratum stands. With uniform literal quotas prefer
    * [[stratified]].
    */
  def mixture(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      weights: Map[String, Double],
      total: Long,
      seed: Long = 42L): DataFrame = {
    require(total > 0, "total must be positive")
    require(weights.values.forall(_ >= 0), "weights must be non-negative")
    val spark = df.sparkSession
    val quotas = spark.createDataFrame(weights.toSeq)
      .toDF(strataCol, "__graft_w")
      .select(col(strataCol),
        floor(lit(total) * col("__graft_w")).cast("long").as("__graft_quota"))
    val w = Window.partitionBy(col(strataCol))
      .orderBy(md5Rank(col(idCol), seed).asc, col(idCol).asc)
    df.join(broadcast(quotas), Seq(strataCol))
      .withColumn("__graft_rank", row_number().over(w))
      .filter(col("__graft_rank") <= col("__graft_quota"))
      .drop("__graft_rank", "__graft_quota")
  }

  /** Temperature-scaled source mixing: the standard multilingual recipe
    * (exponential smoothing, cf. the mBERT/XLM sampling scheme) where
    * stratum `s` gets probability `count(s)^alpha / Σ count(t)^alpha`.
    * `alpha = 1` reproduces the natural distribution, `alpha → 0`
    * approaches uniform — between, head strata (English, CommonCrawl)
    * shrink and tail strata are upsampled RELATIVELY without ever
    * repeating rows: quotas are capped by availability, so an
    * over-allocated tail stratum simply keeps everything.
    *
    * Unlike [[mixture]], the weights come from the DATA — counts
    * aggregate in-engine (one map-side-combined groupBy, a 1-row
    * normalizer broadcast back), so nothing collects to the driver and
    * the same call runs at any corpus size. Selection is the same
    * engine-portable md5 rank cut as [[stratified]]: deterministic in
    * `seed`, monotone in `total`.
    *
    * Exactness note: `pow(count, alpha)` is IEEE-double libm territory —
    * engines may differ in the last ulp, so a quota sitting EXACTLY on
    * an integer boundary could differ across engines. Real corpora are
    * nowhere near such knife edges; differential harnesses should check
    * margins (the driver query's fractional parts are all ≥ 0.2 from a
    * boundary at every gate scale).
    */
  def temperature(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      alpha: Double,
      total: Long,
      seed: Long = 42L): DataFrame = {
    require(alpha > 0 && alpha <= 1, "need 0 < alpha <= 1")
    require(total > 0, "total must be positive")
    val counts = df.groupBy(col(strataCol))
      .agg(count(lit(1)).as("__graft_c"))
    val z = counts.agg(
      sum(pow(col("__graft_c"), alpha)).as("__graft_z"))
    val quotas = counts.crossJoin(broadcast(z))
      .select(col(strataCol),
        // cap at availability: floor(total·w) can exceed the stratum
        // only when other strata are under-allocated
        least(
          floor(lit(total) * pow(col("__graft_c"), alpha) / col("__graft_z"))
            .cast("long"),
          col("__graft_c")).as("__graft_quota"))
    val w = Window.partitionBy(col(strataCol))
      .orderBy(md5Rank(col(idCol), seed).asc, col(idCol).asc)
    df.join(broadcast(quotas), Seq(strataCol))
      .withColumn("__graft_rank", row_number().over(w))
      .filter(col("__graft_rank") <= col("__graft_quota"))
      .drop("__graft_rank", "__graft_quota")
  }

  /** Deterministic Bernoulli-by-hash filter: keep a row iff its md5
    * uniform falls below `p`. Unlike `df.sample` this is a pure
    * PROJECTION — no RNG state, no partition sensitivity — so it is
    * reproducible across engines and runs UNCHANGED in Structured
    * Streaming (the canonical "sample the firehose" op; the stateful
    * samplers above need a batch view). The cut is the integer
    * `floor(p·2^60)` so the comparison is exact in any engine.
    */
  def hashFilter(df: DataFrame, idCol: String, p: Double,
                 seed: Long = 42L): DataFrame = {
    require(p >= 0 && p <= 1, "need 0 <= p <= 1")
    df.filter(md5Rank(col(idCol), seed) < lit(math.floor(p * (1L << 60).toDouble).toLong))
  }

  /** Weight-proportional sampling WITHOUT replacement (Efraimidis–
    * Spirakis A-Res, Inf. Proc. Letters 97(5), 2006): each row draws a
    * deterministic uniform u from its (id, seed) md5 rank and competes
    * with key ln(u)/w — the top-k keys are a weighted sample where a
    * row's selection odds scale with its weight (quality-score-weighted
    * corpus subsetting, importance sampling for eval sets).
    *
    * A-Res is only defined for strictly positive weights: w < 0 flips
    * the key sign (the row always wins), w = 0 divides to ±Inf/NaN (NaN
    * sorts FIRST under desc in Spark), and null weights null the key —
    * all three silently corrupt the sample, so rows with null or
    * non-positive weight are EXCLUDED from the draw (documented
    * contract, mirroring `numpy.random.choice`'s rejection of negative
    * probabilities).
    *
    * Scale posture: global top-k plans as TakeOrderedAndProject —
    * per-partition heaps of size k merged once, NO global sort, no
    * single-partition window; with `strata`, a per-stratum window with
    * the literal cut lets `WindowGroupLimit` prune partitions to their
    * top-k before the final sort. Deterministic in `seed` on any
    * cluster layout either way.
    */
  def weighted(
      df: DataFrame,
      idCol: String,
      weightCol: String,
      k: Int,
      seed: Long = 42L,
      strata: Seq[String] = Nil): DataFrame = {
    require(k > 0, "k must be positive")
    // u in (0, 1]: the +1 keeps ln finite; ln(u)/w is a monotone
    // transform of u^(1/w) with far better float behavior near 1
    val u = (md5Rank(col(idCol), seed).cast("double") + 1.0) /
      lit((1L << 60).toDouble)
    val key = log(u) / col(weightCol).cast("double")
    // rows outside the operator's domain never enter the competition
    val eligible = df.filter(
      col(weightCol).isNotNull && col(weightCol).cast("double") > 0.0)
    if (strata.isEmpty)
      eligible.withColumn("__graft_key", key)
        .orderBy(col("__graft_key").desc, col(idCol).asc)
        .limit(k)
        .drop("__graft_key")
    else {
      val w = Window.partitionBy(strata.map(col): _*)
        .orderBy(key.desc, col(idCol).asc)
      eligible.withColumn("__graft_rank", row_number().over(w))
        .filter(col("__graft_rank") <= k)
        .drop("__graft_rank")
    }
  }

  /** Deterministic train/validation/test-style split: assigns each row a
    * bucket in [0, weights.length) with probability proportional to
    * `weights`, stable in (id, seed) — the md5-rank modulo trick, so the
    * assignment is reproducible row-by-row in any engine and INDEPENDENT
    * of the frame's partitioning or row order.
    *
    * Leakage-free splits: pass a CONTENT or CLUSTER key as `idCol` (a
    * text digest, a near-dup `cluster_id`) and every row sharing the key
    * lands in the same bucket — duplicates can then never straddle
    * train and test, the classic eval-contamination bug a row-id split
    * silently commits. Still a pure projection: no join, no shuffle,
    * stream-safe.
    */
  def assignSplit(
      df: DataFrame,
      idCol: String,
      weights: Seq[Double],
      seed: Long = 42L,
      outCol: String = "split"): DataFrame = {
    require(weights.nonEmpty && weights.forall(_ > 0), "positive weights")
    val total = weights.sum
    val cum = weights.scanLeft(0.0)(_ + _).tail.map(_ / total)
    // uniform in [0,1): 60-bit md5 rank / 2^60
    val u = Sampling.md5Rank(col(idCol), seed).cast("double") / lit((1L << 60).toDouble)
    val bucket = cum.init.zipWithIndex.foldRight(lit(weights.length - 1): Column) {
      case ((bound, i), acc) => when(u < bound, lit(i)).otherwise(acc)
    }
    df.withColumn(outCol, bucket)
  }
}
