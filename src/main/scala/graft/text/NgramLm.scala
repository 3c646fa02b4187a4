package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bigram language-model scoring — the perplexity-style quality signal
  * curation pipelines use to rank documents (classically a KenLM model;
  * here the LM trains on the corpus itself, add-k smoothed): each
  * document gets the mean log-probability of its bigrams,
  * `ln((c(w1,w2) + k) / (c(w1) + k·V))`, where counts come from the
  * whole corpus and `V` is the corpus vocabulary size. Gibberish and
  * boilerplate score low; fluent text scores high.
  *
  * Scale posture: bigram pairs come from a per-row `arrays_zip` of two
  * array slices (no window, no per-doc shuffle); the corpus bigram and
  * context tables are two hash aggregations of the pair stream with
  * map-side combine; scoring re-joins the pair stream against those
  * tables keyed by bigram/context (Catalyst/AQE pick broadcast vs
  * shuffle by size — a web-scale vocabulary degrades to token-keyed
  * shuffle joins, still linear), and the vocabulary size is one scalar
  * broadcast. Training corpus == scored corpus, so every bigram hits.
  */
object NgramLm {

  /** One row per document with >= 2 tokens: `idCol`, `n_bigrams`,
    * `avg_logprob` (natural log, add-`k` smoothing).
    */
  def scoreBigram(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Double = 1.0): DataFrame = {
    require(k > 0, "smoothing k must be positive")
    val staged = docs
      .select(col(idCol).as("_did"), Shingles.tokens(col(textCol)).as("_tk"))
    val pairs = staged.filter(size(col("_tk")) >= 2)
      .select(col("_did"), explode(arrays_zip(
        slice(col("_tk"), lit(1), size(col("_tk")) - 1),
        slice(col("_tk"), lit(2), size(col("_tk")) - 1))).as("_p"))
      .select(col("_did"), col("_p.0").as("_w1"), col("_p.1").as("_w2"))
    val bigramCounts = pairs.groupBy("_w1", "_w2").agg(count(lit(1)).as("_c12"))
    val contextCounts = pairs.groupBy("_w1").agg(count(lit(1)).as("_c1"))
    val vocab = staged.select(explode(col("_tk")).as("_w"))
      .agg(count_distinct(col("_w")).as("_v"))
    pairs
      .join(bigramCounts, Seq("_w1", "_w2"))
      .join(contextCounts, Seq("_w1"))
      .crossJoin(broadcast(vocab))
      .select(col("_did"),
        log((col("_c12") + lit(k)) / (col("_c1") + lit(k) * col("_v"))).as("_lp"))
      .groupBy(col("_did").as(idCol))
      .agg(count(lit(1)).as("n_bigrams"), avg(col("_lp")).as("avg_logprob"))
  }
}
