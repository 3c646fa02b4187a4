package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 relevance scoring of a document corpus against a set of query
  * terms — the retrieval primitive of a training-data pipeline (mining a
  * corpus for documents relevant to a seed set, quality-weighted
  * sampling, targeted decontamination).
  *
  * Formula: Robertson/Sparck-Jones BM25 with the +1 idf floor used by
  * Lucene, `idf = ln(1 + (N - df + 0.5)/(df + 0.5))`,
  * `score = idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))`.
  *
  * Scale posture: ONE shuffle of the token stream builds the per-document
  * term-frequency frame (`groupBy(doc, token)` with map-side combine);
  * document length, corpus totals, and per-term document frequency all
  * derive from that frame, so Catalyst's ReusedExchange serves the three
  * consumers from the same shuffle output. Query terms and the per-term
  * document-frequency frame are broadcast (query sets are small by
  * construction); nothing else is collected to the driver.
  */
object Bm25 {

  /** `(termCol, idCol, score)` for every (query term, document) pair with
    * tf > 0. `terms` is a one-column frame of query terms (deduplicated
    * here). Documents with zero tokens still count toward N and avgdl.
    */
  def apply(docs: DataFrame, idCol: String, textCol: String,
            terms: DataFrame, termCol: String = "term",
            k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val toks = docs.select(col(idCol).as("_did"),
      explode(Shingles.tokens(col(textCol))).as("_tok"))
    // one token-stream shuffle; everything below reuses this exchange
    val tfAll = toks.groupBy("_did", "_tok").agg(count(lit(1)).as("_tf"))
    val dl = tfAll.groupBy("_did").agg(sum("_tf").as("_dl"))
    val stats = docs.agg(count(lit(1)).as("_n"))
      .crossJoin(dl.agg(sum("_dl").as("_tot")))
      .select(col("_n"), (col("_tot").cast("double") / col("_n")).as("_avgdl"))
    val tf = tfAll.join(
      broadcast(terms.select(col(termCol).as("_tok")).distinct()), "_tok")
    val dfreq = tf.groupBy("_tok").agg(count(lit(1)).as("_df"))
    val idf: Column =
      log(lit(1.0) + (col("_n") - col("_df") + lit(0.5)) / (col("_df") + lit(0.5)))
    val norm: Column =
      col("_tf") + lit(k1) * (lit(1 - b) + lit(b) * col("_dl") / col("_avgdl"))
    tf.join(dl, "_did")
      .join(broadcast(dfreq), "_tok")
      .crossJoin(broadcast(stats))
      .select(col("_tok").as(termCol), col("_did").as(idCol),
        (idf * col("_tf") * lit(k1 + 1) / norm).as("score"))
  }
}
