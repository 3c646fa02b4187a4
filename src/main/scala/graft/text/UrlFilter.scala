package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** URL blocklist filtering — the crawl-curation gate that drops
  * documents from blocked sites BEFORE any content-level pass. An
  * entry blocks either an exact host (`cdn.ads.example.com`) or a
  * registrable domain (`example.co.uk`, which takes every subdomain
  * with it via [[UrlOps.registrableDomain]]'s heuristic) — the usual
  * shape of spam/adult/malware domain lists.
  *
  * Plan: the blocklist broadcasts (domain lists are MBs at worst) and
  * the corpus passes through TWO broadcast anti equi-joins — one on
  * host, one on registrable domain. Two equi anti-joins instead of one
  * OR-condition join, deliberately: an OR join condition cannot hash
  * and would plan a BroadcastNestedLoopJoin over the corpus. Stateless
  * aside from the broadcast ⇒ runs unchanged on streams.
  */
object UrlFilter {

  /** Keep rows whose url's host AND registrable domain are both absent
    * from `blocked` (entries lowercased, deduplicated; null/empty
    * entries ignored). Rows with unparseable/null urls have host `''`
    * and pass unless `''` is blocked explicitly.
    */
  def apply(df: DataFrame, urlCol: String, blocked: DataFrame,
            entryCol: String): DataFrame = {
    val bl = blocked
      .select(lower(trim(col(entryCol))).as("__graft_blk"))
      .filter(col("__graft_blk").isNotNull && col("__graft_blk") =!= "")
      .distinct()
    val withHost = df
      .withColumn("__graft_uh", UrlOps.host(col(urlCol)))
      .withColumn("__graft_ud",
        UrlOps.registrableDomain(col("__graft_uh")))
    withHost
      .join(broadcast(bl), col("__graft_uh") === col("__graft_blk"),
        "left_anti")
      .join(broadcast(bl), col("__graft_ud") === col("__graft_blk"),
        "left_anti")
      .drop("__graft_uh", "__graft_ud")
  }
}
