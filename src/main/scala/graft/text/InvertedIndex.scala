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
  * combine, then token-keyed work in two skew-safe shapes. Posting
  * lists are capped BEFORE collection: the `row_number` filter sits
  * DIRECTLY on its rank window, so `InferWindowGroupLimit` inserts a
  * partial `WindowGroupLimit` below the exchange — every map task keeps
  * at most `maxPostings` rows per token, and a stop-word's posting list
  * never materializes beyond cap × maps anywhere (an uncapped
  * `collect_list` on a Zipf-head token would buffer a gigabyte-scale
  * array in one aggregation buffer). Document frequency is EXACT via a
  * map-side-combined `groupBy(token)` count joined back — NOT a
  * count-over-token-partition window, which would pin each hot token's
  * full partition on one task (AQE splits skewed join partitions, never
  * window partitions). `truncated` marks capped tokens.
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

    val dfreq = pairs.groupBy(col("token"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)

    val ranked = Window.partitionBy(col("token")).orderBy(col(idCol).asc)
    val capped = pairs
      .withColumn("__graft_rn", row_number().over(ranked))
      .filter(col("__graft_rn") <= maxPostings)
      .groupBy(col("token"))
      .agg(array_sort(collect_list(col(idCol))).as("postings"))

    capped.join(dfreq, "token")
      .select(col("token"), col("df"), col("postings"),
        (col("df") > maxPostings).as("truncated"))
  }
}
