package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Inverted-index construction: token → document frequency + sorted
  * posting list. The indexing counterpart of [[Bm25]] scoring (build the
  * index once, score against it many times) and the backbone of corpus
  * search / filtering by term.
  *
  * Scale posture: one (doc, token)-distinct aggregation with map-side
  * combine, then ONE shuffle on the token key. Posting lists are capped
  * BEFORE collection: a `row_number` over (token, ordered doc id) lets
  * `WindowGroupLimit` prune each partition to the cap, so a stop-word's
  * posting list never materializes beyond `maxPostings` anywhere — an
  * uncapped `collect_list` on a Zipf head token would buffer a
  * gigabyte-scale array in a single aggregation buffer. Document
  * frequency is still EXACT (counted over the full partition, not the
  * capped rows); `truncated` marks capped tokens.
  */
object InvertedIndex {

  /** One row per token with `df` (exact distinct-doc count), `postings`
    * (ascending doc ids, at most `maxPostings`), `truncated`. Tokens
    * with df < `minDf` are dropped (hapaxes dominate vocabulary size
    * but never match multi-doc queries).
    */
  def build(df: DataFrame, idCol: String, textCol: String,
            minDf: Long = 1L, maxPostings: Int = 10000): DataFrame = {
    require(minDf >= 1, "minDf must be >= 1")
    require(maxPostings >= 1, "maxPostings must be >= 1")

    val pairs = df
      .select(col(idCol), explode(Shingles.tokens(col(textCol))).as("token"))
      .distinct()

    val byTok  = Window.partitionBy(col("token"))
    val ranked = Window.partitionBy(col("token")).orderBy(col(idCol).asc)

    pairs
      .withColumn("df", count(lit(1)).over(byTok))
      .withColumn("__graft_rn", row_number().over(ranked))
      .filter(col("df") >= minDf && col("__graft_rn") <= maxPostings)
      .groupBy(col("token"), col("df"))
      .agg(array_sort(collect_list(col(idCol))).as("postings"))
      .withColumn("truncated", col("df") > maxPostings)
  }
}
