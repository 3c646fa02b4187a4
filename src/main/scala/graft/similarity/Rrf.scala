package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (Cormack, Clarke, Büttcher, SIGIR 2009):
  * combine any number of per-query ranked candidate lists — a lexical
  * BM25/Jaccard leg, a semantic ANN leg ([[IvfAnn]], [[PqAnn]],
  * [[LshAnn]]), a recency leg — into one ranking without score
  * calibration: each leg contributes `1 / (k0 + rank)` and the fused
  * score is the sum over legs, so only RANKS cross the fusion boundary
  * and incomparable leg scores (BM25 logs vs cosines) never mix.
  *
  * Integer-exact variant: the contribution is `scale div (k0 + rank)`
  * in 64-bit integer arithmetic (`scale` = 10^12 keeps 7+ significant
  * digits at any realistic rank), so fused scores, tie-breaks, and the
  * top-k cut are bit-identical under any partitioning and in any
  * engine — float summation order can never reorder two candidates.
  *
  * Scale shape: one union of the (already small, per-query top-N) leg
  * outputs → hash aggregate on (query, doc) with map-side combine →
  * per-query rank window, which WindowGroupLimit prunes map-side to
  * `topK`. Nothing here touches the corpus — legs do the retrieval at
  * their own scale paths; fusion cost is O(queries · N · legs).
  */
object Rrf {

  /** Fuse ranked legs. A document absent from a leg simply contributes
    * nothing for that leg (standard RRF union semantics).
    *
    * @param legs     each (queryCol, docCol, rankCol) with rank 1-based
    * @param topK     fused candidates kept per query
    * @param k0       rank damping (60 in the original paper)
    * @param scale    integer contribution numerator
    * @return (queryCol, docCol, rrf_score, rank) — rank 1..topK by
    *         fused score descending, ties by document id ascending
    */
  def fuse(
      legs: Seq[DataFrame],
      queryCol: String,
      docCol: String,
      rankCol: String,
      topK: Int,
      k0: Int = 60,
      scale: Long = 1000000000000L): DataFrame = {
    require(legs.nonEmpty, "need at least one ranked leg")
    require(topK > 0 && k0 >= 0 && scale > 0, "topK > 0, k0 >= 0, scale > 0")
    val contribs = legs.map(_.selectExpr(
      s"$queryCol AS __q", s"$docCol AS __d",
      s"${scale}L div ($k0 + CAST($rankCol AS BIGINT)) AS __c"))
    val w = Window.partitionBy(col("__q"))
      .orderBy(col("rrf_score").desc, col("__d").asc)
    contribs.reduce(_ unionByName _)
      .groupBy(col("__q"), col("__d"))
      .agg(sum(col("__c")).as("rrf_score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("__q").as(queryCol), col("__d").as(docCol),
        col("rrf_score"), col("rank"))
  }
}
