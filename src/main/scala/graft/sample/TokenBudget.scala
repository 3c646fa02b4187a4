package graft.sample

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget planning and enforcement — the "how much of each source
  * do we train on" step: turn target mixture weights plus a total token
  * budget into per-source token allocations (capped by availability ×
  * a max-repetition factor), then deterministically select documents
  * until each source's allocation is filled.
  *
  * Scale posture: `plan` aggregates the corpus to one row per source
  * (human-scale planning data) and joins the broadcast weight table;
  * `sampleToBudget` is one window pass per source — rows ordered by the
  * engine-portable md5 rank with a running token sum, cut where the
  * PRE-sum crosses the allocation (so the selection is deterministic,
  * partitioning-independent, and monotone in the budget).
  */
object TokenBudget {

  /** One row per source present in `weights`: `tokens_available`,
    * `tokens_allocated = min(budget·w, maxEpochs·available)` (floored to
    * a whole token), `epochs = allocated / available`.
    */
  def plan(docs: DataFrame, srcCol: String, tokCol: String,
           weights: Map[String, Double], budget: Long,
           maxEpochs: Double = 1.0): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(maxEpochs > 0, "maxEpochs must be positive")
    val spark = docs.sparkSession
    val wdf = spark.createDataFrame(weights.toSeq).toDF(srcCol, "__graft_w")
    docs.groupBy(col(srcCol))
      .agg(sum(col(tokCol)).cast("long").as("tokens_available"))
      .join(broadcast(wdf), Seq(srcCol))
      .withColumn("tokens_allocated",
        least(floor(lit(budget) * col("__graft_w")),
          floor(lit(maxEpochs) * col("tokens_available"))).cast("long"))
      .withColumn("epochs",
        col("tokens_allocated").cast("double") / col("tokens_available"))
      .drop("__graft_w")
  }

  /** Keep documents per source, in md5-rank order, while the RUNNING
    * token sum before the document is below that source's quota — the
    * first document to cross the boundary is kept (allocations are
    * slightly overshot, never starved), later ones dropped. Sources
    * absent from `quotas` are dropped entirely.
    */
  def sampleToBudget(docs: DataFrame, srcCol: String, idCol: String,
                     tokCol: String, quotas: Map[String, Long],
                     seed: Long = 42L): DataFrame = {
    val spark = docs.sparkSession
    val qdf = spark.createDataFrame(quotas.toSeq).toDF(srcCol, "__graft_quota")
    val w = Window.partitionBy(col(srcCol))
      .orderBy(Sampling.md5Rank(col(idCol), seed).asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.join(broadcast(qdf), Seq(srcCol))
      .withColumn("__graft_pre", coalesce(sum(col(tokCol)).over(w), lit(0L)))
      .filter(col("__graft_pre") < col("__graft_quota"))
      .drop("__graft_pre", "__graft_quota")
  }
}
