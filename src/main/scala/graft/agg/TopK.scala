package graft.agg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Grouped and global top-k — the "keep the best k per group" primitive
  * (best documents per source, highest-scoring candidates per query,
  * largest orders per customer).
  *
  * Scale posture:
  *  - [[perGroup]] is a `row_number` rank window with the filter DIRECTLY
  *    above it, the exact shape Spark's `InferWindowGroupLimit` rewrites
  *    into a `WindowGroupLimit` pre-rank: each task keeps a bounded
  *    per-group heap BELOW the sort, so a group never materializes more
  *    than k buffered rows — a Zipf-headed group with 10⁸ rows costs the
  *    same memory as one with 10³ (audited in the spec).
  *  - [[global]] is `orderBy(...).limit(k)`, which Spark plans as
  *    `TakeOrderedAndProject`: per-partition heaps + a k-row driver
  *    merge; no global sort, no single-partition shuffle.
  *
  * Ties: callers pass explicit tie-breaking columns (e.g. an id) to make
  * results deterministic; the reference's grouped top-1 (`keep=
  * "first"/"last"`, `merging.py:92-98`) breaks ties by original row
  * order, which is the same mechanism with the row id as tie-breaker.
  */
object TopK {

  /** Rows ranked in the top `k` of their group by `order`; adds
    * `rankCol` (1-based) when `rankCol` is non-empty.
    */
  def perGroup(df: DataFrame, groupBy: Seq[String], order: Seq[Column],
               k: Int, rankCol: String = ""): DataFrame = {
    require(k > 0, "k must be positive")
    require(order.nonEmpty, "top-k needs at least one ordering column")
    val w = Window.partitionBy(groupBy.map(col): _*).orderBy(order: _*)
    val rn = "__graft_topk_rn"
    val ranked = df.withColumn(rn, row_number().over(w)).filter(col(rn) <= k)
    if (rankCol.nonEmpty) ranked.withColumnRenamed(rn, rankCol)
    else ranked.drop(rn)
  }

  /** Global top `k` by `order` (TakeOrderedAndProject — never a global
    * sort).
    */
  def global(df: DataFrame, order: Seq[Column], k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    df.orderBy(order: _*).limit(k)
  }
}
