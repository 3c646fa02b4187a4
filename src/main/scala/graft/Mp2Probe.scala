package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.similarity.{CosineTopK, LshAnn}

/** Multi-probe ORDER study: does the second-order (multi-bit) prefix of
  * the Lv et al. perturbation sequence close on brute force at a fixed
  * probed-bucket budget, or flatten? Measures recall@10 against the
  * exact brute top-10 on the UNBIASED md5-rank query sample for
  * single-table order-1/order-2 probe ladders plus the multi-table
  * baselines, and prints one JSON line per configuration. Evidence
  * artifact for SCALING.md — not part of the driver contract.
  *
  * Budget accounting: a configuration probes
  * `numTables · (1 + multiProbe)` buckets per query; the corpus-side
  * (index) cost scales with `numTables` alone — which is exactly why
  * probes are the cheap axis and tables the expensive one.
  *
  * De-twin mode (`SPARK_GRAFT_DETWIN=<replica offset>`, e.g.
  * 100000000 for a `tools/scale10.py`-replicated directory): the
  * replicated corpus gives every query 9 EXACT twins (`vec_id ≡ query
  * mod offset`, embeddings copied verbatim), which share its bucket in
  * every table and pin base recall at 0.9 — the comparison then
  * happens in a compressed 0.90–0.98 band (the round-13 caveat,
  * SCALING.md). The standard ANN protocol excludes a query's own
  * twins from ground truth: both the exact baseline and every probed
  * search oversample to k + 9, drop own-twin rows, and re-rank to
  * k — restoring a discriminating recall band at 10× data.
  *
  * Usage: SPARK_GRAFT_SF_DIR=… [SPARK_GRAFT_DETWIN=100000000]
  *        runMain graft.Mp2Probe
  */
object Mp2Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val detwin = sys.env.get("SPARK_GRAFT_DETWIN").map(_.toLong)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
      .repartition(spark.sparkContext.defaultParallelism)
    // sample size is a knob: under de-twinning on a verbatim-replica
    // corpus each query's ground truth collapses to copies of ~one
    // foreign base vector, so recall moves in 1/|queries| steps — more
    // queries buy resolution
    val nQueries =
      sys.env.getOrElse("SPARK_GRAFT_MP2_QUERIES", "10").toInt
    val q = graft.sample.Sampling.md5RankPinned(
      e.filter(col("embedding").isNotNull), "vec_id", nQueries)

    val k = 10
    // with de-twinning both sides oversample so dropping ≤ 9 own-twin
    // rows still leaves k candidates to re-rank
    val kOver = detwin.map(_ => k + 9).getOrElse(k)
    def detwinned(topk: org.apache.spark.sql.DataFrame)
        : org.apache.spark.sql.DataFrame = detwin match {
      case None => topk
      case Some(off) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("neighbor_id").asc)
        topk.filter(col("neighbor_id") % off =!= col("query_id") % off)
          .withColumn("__rk", row_number().over(w))
          .filter(col("__rk") <= k)
    }

    val exact = detwinned(
        CosineTopK(e, q, "vec_id", "embedding", k = kOver))
      .select(col("query_id"), col("neighbor_id"))
      .localCheckpoint(true)
    val possible = exact.count().toDouble

    def run(tables: Int, bits: Int, mp: Int, order: Int): Unit = {
      val t0 = System.nanoTime()
      val hits = detwinned(
          LshAnn.search(e, q, "vec_id", "embedding", k = kOver,
            numBits = bits, numTables = tables, multiProbe = mp,
            probeOrder = order))
        .select(col("query_id"), col("neighbor_id"))
        .join(exact, Seq("query_id", "neighbor_id")).count()
      val sec = (System.nanoTime() - t0) / 1e9
      val budget = tables * (1 + mp)
      println(f"""{"tables":$tables,"bits":$bits,"multiProbe":$mp,""" +
        f""""order":$order,"buckets":$budget,"detwin":${detwin.isDefined},""" +
        f""""recall":${hits / possible}%.4f,"sec":$sec%.3f}""")
    }

    // single-table probe ladders at 6 bits: order 1 caps at 6 probes
    // (every Hamming-1 bucket); order 2 continues through the pair sets
    for (mp <- Seq(0, 2, 4, 6)) run(1, 6, mp, order = 1)
    for (mp <- Seq(2, 4, 6, 10, 15, 21)) run(1, 6, mp, order = 2)
    // the table-built baselines at matching bucket budgets
    for (t <- Seq(2, 4, 8)) run(t, 6, 0, order = 1)
    // the shipped q_ann_lsh_mp shape
    run(2, 6, 2, order = 1)
    // the probes×tables FRONTIER: order-2 ladders at 2 and 4 tables,
    // budget-matched to the single-table rows (buckets = T·(1+mp); the
    // 16- and 22-bucket columns line up across T = 1/2/4, with 4T
    // bracketing 22 at 20 and 24) — where does an extra TABLE (which
    // multiplies the persisted index) beat an extra PROBE (which only
    // adds query-side rows)? The knee is the production answer.
    for (mp <- Seq(2, 4, 7, 10)) run(2, 6, mp, order = 2)
    for (mp <- Seq(1, 3, 4, 5)) run(4, 6, mp, order = 2)
    spark.stop()
  }
}
