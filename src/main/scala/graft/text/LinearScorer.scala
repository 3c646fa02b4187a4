package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hashed linear text classifier INFERENCE — the fasttext-style quality
  * / toxicity / domain scorer applied per document during curation
  * (reference quality filters cover heuristics; curation pipelines
  * additionally score every document with a trained linear model and
  * gate or weight on the score).
  *
  * Model = `buckets` weights + bias, all Long fixed-point (units of
  * `1/1e6`): a document's features are its whitespace tokens plus
  * adjacent-token bigrams WITH multiplicity (the fasttext feature set);
  * each feature hashes to a bucket through the engine-portable md5 rank
  * ([[graft.sample.Sampling.md5Rank]]'s 60-bit construction), and
  *
  *   score_fp = bias + Σ_f weights(md5_60(seed#f) mod buckets)
  *
  * — an exact integer, so scores are BIT-IDENTICAL in any engine with
  * md5 and 64-bit ints (DuckDB oracle inlines the same weight table,
  * zero float tolerance). Training happens offline (any logistic
  * trainer); this op is the 100 TB-side half: a stateless, codegen'd,
  * streaming-safe projection — no shuffle, no UDF, no state. The
  * weights ship as a literal array inside the expression (a few KB for
  * any sane bucket count; use a broadcast join variant past ~1M
  * buckets).
  */
object LinearScorer {

  /** @param weights bucket weights, fixed-point 1e-6
    * @param bias    intercept, fixed-point 1e-6
    * @param seed    feature-hash seed (must match training)
    */
  case class Model(weights: IndexedSeq[Long], bias: Long, seed: Long) {
    require(weights.nonEmpty, "need at least one bucket")
    val buckets: Int = weights.length
  }

  /** 60-bit portable feature hash — identical construction to
    * `Sampling.md5Rank` (md5 of "seed#feature", first 15 hex digits).
    */
  private def bucket(f: Column, seed: Long, b: Int): Column =
    conv(substring(md5(concat_ws("#", lit(seed), f).cast("binary")), 1, 15),
      16, 10).cast("long") % b

  /** Adjacent-token bigrams with multiplicity ("a b", "b c", …); empty
    * for docs under 2 tokens. */
  private def bigrams(ts: Column): Column =
    when(size(ts) >= 2,
      transform(sequence(lit(1), size(ts) - 1),
        i => concat_ws(" ", element_at(ts, i), element_at(ts, i + 1))))
      .otherwise(array().cast("array<string>"))

  /** Append `score_fp` (exact integer score) and `n_feats` for the text
    * column. One staged token materialization, then a single `aggregate`
    * fold over the feature array — map-side only.
    *
    * Null text scores null (and [[filter]] drops it — null never clears
    * the gate); empty/whitespace text has zero features and scores
    * exactly `bias`.
    */
  def score(
      df: DataFrame,
      textCol: String,
      model: Model,
      scoreCol: String = "score_fp",
      nFeatsCol: String = "n_feats"): DataFrame = {
    val w = typedLit(model.weights)
    val ts = col("__graft_lin_toks")
    val feats = concat(ts, bigrams(ts))
    df.withColumn("__graft_lin_toks", Shingles.tokens(col(textCol)))
      .withColumn(nFeatsCol, size(feats).cast("long"))
      .withColumn(scoreCol,
        aggregate(feats, lit(model.bias),
          (acc, f) => acc +
            element_at(w, (bucket(f, model.seed, model.buckets) + 1).cast("int"))))
      .drop("__graft_lin_toks")
  }

  /** Gate variant: keep rows whose fixed-point score clears `minScore`. */
  def filter(df: DataFrame, textCol: String, model: Model,
      minScore: Long): DataFrame =
    score(df, textCol, model).filter(col("score_fp") >= minScore)
      .drop("score_fp", "n_feats")
}
