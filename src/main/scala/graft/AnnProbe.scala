package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.similarity.IvfAnn

/** IVF stage-cost probe: times the quantizer fit, the corpus cell
  * assignment scan, and the probe-join search separately so a wall-time
  * regression can be attributed to a stage instead of guessed. Prints
  * one JSON line. Evidence artifact for SCALING.md — not part of the
  * driver contract.
  *
  * Usage: SPARK_GRAFT_SF_DIR=… runMain graft.AnnProbe
  */
object AnnProbe {
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
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("embedding"))
      .repartition(spark.sparkContext.defaultParallelism)

    def time[A](what: String, passes: Int = 3)(f: => A): Double = {
      val ts = (1 to passes).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      ts.min
    }

    val tFit = time("fit") { IvfAnn.fit(e, "vec_id", "embedding", nlist = 16) }
    val model = IvfAnn.fit(e, "vec_id", "embedding", nlist = 16)
    val tAssign = time("assign") {
      e.filter(col("embedding").isNotNull)
        .select(model.cell(col("embedding")).as("cell"))
        .selectExpr("sum(cell)").collect()
    }
    val tProbes = time("probes") {
      e.filter(col("vec_id") < 10)
        .select(explode(model.probes(col("embedding").cast("array<double>"), 4)))
        .selectExpr("sum(col)").collect()
    }
    val tSearch = time("search") {
      IvfAnn(e, e.filter(col("vec_id") < 10), "vec_id", "embedding",
        k = 5, nlist = 16, nprobe = 4).queryExecution.toRdd.count()
    }
    // join + cosine only (no top-k window): isolates the scoring join
    val queries = e.filter(col("vec_id") < 10)
    val c = e.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("cv"), model.cell(col("embedding")).as("cell"))
    val q = broadcast(queries
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        explode(model.probes(col("embedding"), 4)).as("cell")))
    val joined = c.join(q,
      c("cell") === q("cell") && col("query_id") =!= col("neighbor_id"))
    val nJoined = joined.count()
    val tJoin = time("join") { joined.queryExecution.toRdd.count() }
    val tScore = time("score") {
      joined.select(col("query_id"), col("neighbor_id"),
        graft.similarity.VectorOps.cosine(col("qv"), col("cv")).as("cosine"))
        .queryExecution.toRdd.count()
    }
    // materialized joined rows → cosine: separates join-context eval
    // from the expression's own cost
    val jc = joined.select(col("query_id"), col("neighbor_id"),
      col("qv"), col("cv")).localCheckpoint(true)
    val tScoreCp = time("score_cp") {
      jc.select(graft.similarity.VectorOps.cosine(col("qv"), col("cv"))
        .as("cosine")).selectExpr("sum(cosine)").collect()
    }
    val tSearchNoAqe = {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val t = time("search_noaqe") {
        IvfAnn(e, queries, "vec_id", "embedding",
          k = 5, nlist = 16, nprobe = 4).queryExecution.toRdd.count()
      }
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      t
    }
    def scoreDf = joined.select(col("query_id"), col("neighbor_id"),
      graft.similarity.VectorOps.cosine(col("qv"), col("cv")).as("cosine"))
    val tScoreNoCodegen = {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val t = time("score_nocg") { scoreDf.queryExecution.toRdd.count() }
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      t
    }
    val tDotOnly = time("dot_only") {
      joined.select(org.apache.spark.sql.graft.VecFunctions
        .vec_dot(col("qv"), col("cv")).as("d"))
        .queryExecution.toRdd.count()
    }
    if (sys.env.contains("SPARK_GRAFT_EXPLAIN")) {
      import org.apache.spark.sql.execution.debug._
      scoreDf.debugCodegen()
    }

    // ── PQ bit-width probe: the table-carrying native expressions at
    // the ksub = 8 demo budget vs the ksub = 256 production budget.
    // The round-9 JIT cliff showed a silently-interpreted stage costs
    // ~100× with a perfect-looking plan; if the 256-entry LUTs stayed
    // compiled, adc256 tracks adc8 within a small factor (the LUT is
    // indexed, not scanned — cost is per-code, not per-entry) and sits
    // far under its own whole-stage-codegen-off control.
    import graft.similarity.PqAnn
    val (pq8m, codes8) = PqAnn.fit(e, "vec_id", "embedding",
      m = 8, ksub = 8, iters = 1)
    val (pq256m, codes256) = PqAnn.fit(e, "vec_id", "embedding",
      m = 8, ksub = 256, iters = 1)
    def encProbe(model: PqAnn.Model): Double = time("enc") {
      e.filter(col("embedding").isNotNull)
        .select(model.encode(col("embedding")).as("c"))
        .selectExpr("sum(size(c))").collect()
    }
    def adcProbe(model: PqAnn.Model, codes: org.apache.spark.sql.DataFrame): Double = {
      val qf = broadcast(queries
        .select(col("vec_id").as("query_id"),
          model.lut(col("embedding")).as("__lut")))
      time("adc") {
        codes.crossJoin(qf)
          .select(model.adc(col("pq_codes"), col("__lut")).as("d"))
          .selectExpr("sum(d)").collect()
      }
    }
    val tEnc8 = encProbe(pq8m)
    val tEnc256 = encProbe(pq256m)
    val tAdc8 = adcProbe(pq8m, codes8)
    val tAdc256 = adcProbe(pq256m, codes256)
    val tAdc256NoCg = {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val t = adcProbe(pq256m, codes256)
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      t
    }

    println(s"""{"sf":"$sfDir","fit":$tFit,"assign":$tAssign,""" +
      s""""probes":$tProbes,"search":$tSearch,"join":$tJoin,""" +
      s""""score":$tScore,"score_cp":$tScoreCp,""" +
      s""""search_noaqe":$tSearchNoAqe,"score_nocg":$tScoreNoCodegen,""" +
      s""""dot_only":$tDotOnly,"joined_rows":$nJoined,""" +
      s""""pq_encode8":$tEnc8,"pq_encode256":$tEnc256,""" +
      s""""pq_adc8":$tAdc8,"pq_adc256":$tAdc256,""" +
      s""""pq_adc256_nocg":$tAdc256NoCg}""")
    spark.stop()
  }
}
