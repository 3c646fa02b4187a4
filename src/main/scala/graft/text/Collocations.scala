package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus collocation mining by pointwise mutual information — the
  * phrase-discovery step of vocabulary/tokenizer curation ("new york",
  * "machine learning" should become units; PMI is the classic score,
  * Church & Hanks 1990). Complements [[NgramLm]] (which scores DOCUMENTS
  * by corpus bigram statistics) by scoring the BIGRAMS themselves.
  *
  * `pmi(a,b) = ln( p(a,b) / (p(a)·p(b)) )` with `p(a,b) = n_ab / T`
  * over the adjacent-pair distribution and `p(a) = n_a / U` over the
  * token distribution. The arithmetic is a fixed-shape double
  * expression, identical in any engine — the driver oracle reproduces
  * it bit-for-bit modulo the established 1e-9 rounding nudge.
  *
  * Scale posture: adjacent pairs come from a per-row `arrays_zip` of
  * two array slices (stateless, no window); bigram and unigram tables
  * are map-side-combined hash aggregations; `minCount` prunes the
  * hapax tail BEFORE the two count joins (Heaps' law makes the
  * surviving table sublinear in corpus size; the joins are
  * token-keyed, AQE-splittable on Zipf heads); totals are one 2-value
  * scalar broadcast; the final cut is a distributed
  * TakeOrderedAndProject with a fully deterministic order — ties at
  * the top-k boundary cannot flip between runs or engines.
  */
object Collocations {

  /** Top `topK` collocations `(w1, w2, n_pair, pmi)` with
    * `n_pair >= minCount`, ordered by `(pmi desc, w1, w2)`. */
  def apply(
      docs: DataFrame,
      textCol: String,
      minCount: Long = 5L,
      topK: Int = 100): DataFrame = {
    require(minCount >= 1, "minCount must be >= 1")
    require(topK >= 1, "topK must be >= 1")
    val staged = docs.select(Shingles.tokens(col(textCol)).as("_tk"))
    val pairs = staged.filter(size(col("_tk")) >= 2)
      .select(explode(arrays_zip(
        slice(col("_tk"), lit(1), size(col("_tk")) - 1),
        slice(col("_tk"), lit(2), size(col("_tk")) - 1))).as("_p"))
      .select(col("_p.0").as("w1"), col("_p.1").as("w2"))
    val bigrams = pairs.groupBy("w1", "w2")
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minCount)
    val tokens = staged.select(explode(col("_tk")).as("_w"))
    val unigrams = tokens.groupBy("_w").agg(count(lit(1)).as("_nw"))
    // T (pair total) and U (token total) in one 1-row broadcast frame
    val totals = pairs.agg(count(lit(1)).as("_tp"))
      .crossJoin(broadcast(tokens.agg(count(lit(1)).as("_tu"))))
    val u1 = unigrams.select(col("_w").as("w1"), col("_nw").as("_n1"))
    val u2 = unigrams.select(col("_w").as("w2"), col("_nw").as("_n2"))
    bigrams
      .join(u1, "w1").join(u2, "w2")
      .crossJoin(broadcast(totals))
      .select(col("w1"), col("w2"), col("n_pair"),
        // fixed double expression shape — mirrored verbatim in the oracle
        log((col("n_pair").cast("double") * col("_tu").cast("double") *
            col("_tu").cast("double")) /
          (col("_tp").cast("double") * col("_n1").cast("double") *
            col("_n2").cast("double"))).as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(topK)
  }
}
