package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF term weighting over a document corpus — the classic
  * vectorization/keyword-extraction primitive (sklearn
  * `TfidfTransformer` conventions: raw term counts,
  * `idf = ln((1+N)/(1+df)) + 1` smoothed idf, optional per-document L2
  * normalization).
  *
  * Scale posture: ONE shuffle of the token stream builds the
  * per-(document, term) count frame; document frequency is a map-side-
  * combined `groupBy(term)` joined back (skew-safe: AQE splits skewed
  * join partitions, which a count-over-term-partition window — one task
  * per Zipf-head term — would not allow); the per-doc L2 norm and the
  * `topK` rank are windows over the DOCUMENT partition, bounded by
  * per-document vocabulary. Corpus size N is a 1-row broadcast. The
  * `topK` filter ranks by the raw integer count (engine-portable ties)
  * and sits directly on its window, so Spark executes it with
  * WindowGroupLimit pruning below the sort.
  */
object TfIdf {

  /** Per-(document, term) weights: `(idCol, term, tf, df, tfidf[, tfidf_l2])`.
    *
    * @param minDf drop terms appearing in fewer than `minDf` documents
    * @param topK  if > 0, keep each document's `topK` terms by
    *              (tf desc, term asc) — raw-count ranking, deterministic
    *              across engines; pass `rankByTfIdf = true` to rank by
    *              (tfidf desc, term asc) instead (deterministic within a
    *              JVM; last-ulp `ln` differences can flip near-ties across
    *              engines, so the cross-engine oracle uses count ranking)
    * @param l2    add `tfidf_l2`, the per-document L2-normalized weight
    *              (computed over ALL surviving terms, before any topK cut)
    */
  def apply(docs: DataFrame, idCol: String, textCol: String,
            minDf: Long = 1L, topK: Int = -1, rankByTfIdf: Boolean = false,
            l2: Boolean = false): DataFrame = {
    val toks = docs.select(col(idCol).as("_did"),
      explode(Shingles.tokens(col(textCol))).as("_tok"))
    val tf = toks.groupBy("_did", "_tok").agg(count(lit(1)).as("_tf"))
    // one row per (doc, term) ⇒ df = groupBy(term) count, joined back.
    // NOT a count-over-term-partition window: a Zipf-head term puts its
    // whole partition on one task, and AQE can split skewed JOIN
    // partitions but never window partitions — the aggregate reduces
    // map-side and the join side AQE handles
    val dfreq = tf.groupBy("_tok").agg(count(lit(1)).as("_df"))
      .filter(col("_df") >= minDf)
    val withDf = tf.join(dfreq, "_tok")
    val n1 = docs.agg(count(lit(1)).as("_n"))
    val scored = withDf.crossJoin(broadcast(n1)).withColumn("_tfidf",
      col("_tf") * (log((lit(1L) + col("_n")).cast("double") /
        (lit(1L) + col("_df")).cast("double")) + lit(1.0)))
    val normed =
      if (l2) scored.withColumn("_l2",
        col("_tfidf") / sqrt(sum(col("_tfidf") * col("_tfidf"))
          .over(Window.partitionBy("_did"))))
      else scored
    val cut =
      if (topK > 0) {
        val order = if (rankByTfIdf) Seq(col("_tfidf").desc, col("_tok").asc)
                    else Seq(col("_tf").desc, col("_tok").asc)
        normed.withColumn("_rn", row_number()
            .over(Window.partitionBy("_did").orderBy(order: _*)))
          .filter(col("_rn") <= topK)
      } else normed
    val base = cut.select(
      Seq(col("_did").as(idCol), col("_tok").as("term"), col("_tf").as("tf"),
        col("_df").as("df"), col("_tfidf").as("tfidf")) ++
        (if (l2) Seq(col("_l2").as("tfidf_l2")) else Nil): _*)
    base
  }
}
