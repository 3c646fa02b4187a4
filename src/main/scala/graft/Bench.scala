package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // bench-scale knob: the sf parquet files are a few MB, so the 128m
      // default yields single-task scans; real clusters keep the default
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // experiment knob: AQE re-plans (and often re-compiles) after every
      // exchange — pure driver latency at bench scale, pure win at real
      // scale. Default ON (the scale posture); SPARK_GRAFT_AQE=false to
      // quantify the overhead locally.
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JIT + codegen + scan machinery class-loading costs
    // ~4-5s on the first executed query and would be misattributed to it
    try {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy("l_returnflag").count().count()
    } catch { case _: Throwable => () }
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    var failed = List.empty[String]
    val results = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
        val t0 = System.nanoTime()
        // toRdd.count(): forces every output column to be computed —
        // df.count() would let Catalyst prune the projections entirely
        val ok =
          try { fn(spark, sfDir).queryExecution.toRdd.count(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            failed ::= name
            false
          }
        val dt = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[bench] $name%-24s $dt%8.2f s")
        // a crashed query must not masquerade as a fast one
        name -> (if (ok) dt else -1.0)
      }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.filter(_ >= 0).sum else 0.0
    val failedJson = failed.reverse.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
