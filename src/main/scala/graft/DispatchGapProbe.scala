package graft

import org.apache.spark.sql.SparkSession

/** Paired same-JVM measurement of the rule-planned dispatch overhead:
  * alternates `q_auto_sweep` (direct operator API) and
  * `q_rule_auto_sweep` (declarative join through the optimizer rule +
  * deferred dispatch) in ONE JVM so host-era noise cancels, and prints
  * the per-pass times and gaps as one JSON line. Evidence artifact for
  * SCALING.md's dispatch-boundary question — not part of the driver
  * contract.
  *
  * Usage: SPARK_GRAFT_SF_DIR=… runMain graft.DispatchGapProbe
  */
object DispatchGapProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(name: String): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    // warm both paths (janino/JIT, file listing) — twice: the rule
    // path's nested executions JIT later than the operator path's
    run("q_auto_sweep"); run("q_rule_auto_sweep")
    run("q_auto_sweep"); run("q_rule_auto_sweep")
    val pairs = (1 to 4).map { _ =>
      System.gc()
      val (a, na) = run("q_auto_sweep")
      val (r, nr) = run("q_rule_auto_sweep")
      require(na == nr, s"row mismatch: $na $nr")
      (a, r)
    }
    def pct(r: Double, a: Double) = math.round((r / a - 1) * 1000) / 10.0
    println(s"""{"probe":"dispatch_gap","sf":"$sfDir",""" +
      s""""auto_sec":[${pairs.map(_._1).mkString(",")}],""" +
      s""""rule_sec":[${pairs.map(_._2).mkString(",")}],""" +
      s""""gap_pct":[${pairs.map(p => pct(p._2, p._1)).mkString(",")}]}""")
    spark.stop()
  }
}
