package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text tokenization / shingling expressions for the dedup and
  * text-analysis operators. All pure built-in (codegen'd) expressions —
  * no UDFs — so they stay inside whole-stage codegen and push down into
  * the scan projection.
  */
object Shingles {

  /** Lower-cased whitespace tokens of a text column. */
  def tokens(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), t => length(t) > 0)

  /** Distinct word `n`-grams (space-joined) of a text column; the shingle
    * set for MinHash / Jaccard. Documents shorter than `n` tokens yield
    * their full token sequence as a single shingle.
    */
  def wordNGrams(text: Column, n: Int): Column =
    wordNGramsFromTokens(tokens(text), n)

  /** N-grams from an ALREADY-MATERIALIZED token-array column. Hot paths
    * must stage the tokens first: the sliding-window lambda references its
    * input per gram, and interpreted HOF eval re-evaluates a non-column
    * input expression per reference — an O(tokens²) regex-split blowup
    * when handed `tokens(text)` directly.
    */
  def wordNGramsFromTokens(ts: Column, n: Int): Column =
    array_distinct(transform(
      sequence(lit(0), greatest(size(ts) - n, lit(0))),
      i => concat_ws(" ", slice(ts, i + 1, lit(n)))))

  /** Jaccard similarity of two shingle-set columns (arrays). Evaluates the
    * intersection twice in one expression — fine in tests; hot paths use
    * [[stageJaccard]] so the intersection is materialized once.
    */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(a) + size(b) - size(array_intersect(a, b))
    when(union === 0, lit(1.0)).otherwise(inter / union)
  }

  /** Append `outCol` = Jaccard of two array columns, computing the (heavy)
    * intersection exactly once via a staged intermediate column.
    */
  def stageJaccard(df: org.apache.spark.sql.DataFrame,
      aCol: String, bCol: String, outCol: String): org.apache.spark.sql.DataFrame = {
    val inter = col("__graft_inter")
    val union = size(col(aCol)) + size(col(bCol)) - inter
    df.withColumn("__graft_inter", size(array_intersect(col(aCol), col(bCol))))
      .withColumn(outCol,
        when(union === 0, lit(1.0)).otherwise(inter.cast("double") / union))
      .drop("__graft_inter")
  }
}
