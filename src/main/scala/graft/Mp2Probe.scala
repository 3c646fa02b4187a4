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
  * Usage: SPARK_GRAFT_SF_DIR=… runMain graft.Mp2Probe
  */
object Mp2Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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
    val q = graft.sample.Sampling.md5RankPinned(
      e.filter(col("embedding").isNotNull), "vec_id", 10)

    val exact = CosineTopK(e, q, "vec_id", "embedding", k = 10)
      .select(col("query_id"), col("neighbor_id"))
      .localCheckpoint(true)
    val possible = exact.count().toDouble

    def run(tables: Int, bits: Int, mp: Int, order: Int): Unit = {
      val t0 = System.nanoTime()
      val hits = LshAnn.search(e, q, "vec_id", "embedding", k = 10,
          numBits = bits, numTables = tables, multiProbe = mp,
          probeOrder = order)
        .select(col("query_id"), col("neighbor_id"))
        .join(exact, Seq("query_id", "neighbor_id")).count()
      val sec = (System.nanoTime() - t0) / 1e9
      val budget = tables * (1 + mp)
      println(f"""{"tables":$tables,"bits":$bits,"multiProbe":$mp,""" +
        f""""order":$order,"buckets":$budget,""" +
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
