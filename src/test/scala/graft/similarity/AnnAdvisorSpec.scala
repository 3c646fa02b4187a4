package graft.similarity

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The recall-targeted parameter advisor: on a CLUSTERED fixture corpus
  * (where cell pruning genuinely works) it must return a configuration
  * meeting the floor at the minimum measured probed fraction, be
  * deterministic under repartitioning, and degrade honestly (no
  * configuration meets an impossible floor ⇒ `chosen = None`, table
  * still measured).
  */
class AnnAdvisorSpec extends SparkSuite {
  import spark.implicits._

  // 4 well-separated direction clusters in 8-d: 60 vectors per cluster
  // with small deterministic jitter — IVF at nlist >= 4 prunes cleanly
  private def corpus = {
    val centers = Seq(
      Seq(1.0, 0, 0, 0, 0, 0, 0, 0), Seq(0, 1.0, 0, 0, 0, 0, 0, 0),
      Seq(0, 0, 1.0, 0, 0, 0, 0, 0), Seq(0, 0, 0, 1.0, 0, 0, 0, 0))
    (0 until 240).map { i =>
      val c = centers(i % 4)
      val v = c.zipWithIndex.map { case (x, d) =>
        (x + ((i * 7 + d * 13) % 19 - 9) / 200.0).toFloat }
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
  }

  test("advisor picks the cheapest configuration meeting the floor") {
    val a = AnnAdvisor.advise(corpus, "vec_id", "embedding", k = 5,
      recallFloor = 0.9, nlists = Seq(4, 8), nprobes = Seq(1, 2, 4),
      sampleQueries = 12)
    assert(a.table.nonEmpty)
    // every measured row is a real (nlist, nprobe <= nlist) pair with a
    // recall in [0, 1]
    assert(a.table.forall(m => m.nprobe <= m.nlist &&
      m.recall >= 0 && m.recall <= 1))
    val c = a.chosen.getOrElse(fail(s"no config met 0.9: ${a.table}"))
    assert(c.recall >= 0.9)
    // minimality: nothing that met the floor probes a smaller fraction
    val qualifying = a.table.filter(_.recall >= 0.9)
    assert(qualifying.forall(_.probedFraction >= c.probedFraction),
      s"chosen $c not minimal among $qualifying")
    // on this clustered fixture the clean answer is known: one probed
    // cell suffices (queries sit inside their cluster's cell)
    assert(c.nprobe == 1, s"expected nprobe = 1 on separated clusters: $c")
  }

  test("advisor is deterministic under repartitioning") {
    def run(parts: Int) = AnnAdvisor.advise(
      corpus.repartition(parts), "vec_id", "embedding", k = 5,
      recallFloor = 0.8, nlists = Seq(4, 8), nprobes = Seq(1, 2),
      sampleQueries = 10)
    val (a, b) = (run(1), run(7))
    assert(a.table == b.table)
    assert(a.chosen == b.chosen)
  }

  test("trained candidates are measured beside the seed family") {
    val a = AnnAdvisor.advise(corpus, "vec_id", "embedding", k = 5,
      recallFloor = 0.9, nlists = Seq(4), nprobes = Seq(1, 2),
      sampleQueries = 10, trainedNlists = Seq(4))
    assert(a.table.count(_.quantizer == "seed") == 2)
    assert(a.table.count(_.quantizer == "kmeans") == 2)
    // the trained quantizer's cells converge to the cluster means on
    // the separated fixture: one probe must already meet the floor
    val k1 = a.table
      .find(m => m.quantizer == "kmeans" && m.nprobe == 1)
      .getOrElse(fail(s"no kmeans nprobe=1 row: ${a.table}"))
    assert(k1.recall >= 0.9, s"trained one-probe recall too low: $k1")
    // the chosen row qualifies and is minimal across BOTH families
    val c = a.chosen.getOrElse(fail("nothing met the floor"))
    assert(a.table.filter(_.recall >= 0.9)
      .forall(_.probedFraction >= c.probedFraction))
  }

  test("lsh_mp candidates are measured beside both cell families, in " +
      "the same probed-fraction unit") {
    val a = AnnAdvisor.advise(corpus, "vec_id", "embedding", k = 5,
      recallFloor = 0.5, nlists = Seq(4), nprobes = Seq(1, 2),
      sampleQueries = 10, trainedNlists = Seq(4),
      lshConfigs = Seq((6, 2, 2), (6, 2, 6)))
    val lsh = a.table.filter(_.quantizer == "lsh_mp")
    assert(lsh.size == 2)
    // the mapping contract: nlist = 2^bits, nprobe = tables·(1+probes),
    // probedFraction = nprobe/nlist — the unit shared with IVF rows
    assert(lsh.map(m => (m.nlist, m.nprobe)).toSet ==
      Set((64, 6), (64, 14)))
    assert(lsh.forall(m =>
      m.probedFraction == m.nprobe.toDouble / m.nlist &&
        m.recall >= 0 && m.recall <= 1))
    // more probes at the same banding never lose recall (supersets of
    // probed buckets)
    val r6 = lsh.find(_.nprobe == 6).get.recall
    val r14 = lsh.find(_.nprobe == 14).get.recall
    assert(r14 >= r6, s"probe monotonicity violated: $r6 -> $r14")
    // the chosen row is minimal across ALL THREE families
    val c = a.chosen.getOrElse(fail("nothing met the floor"))
    assert(a.table.filter(_.recall >= 0.5)
      .forall(_.probedFraction >= c.probedFraction),
      s"chosen $c not minimal in ${a.table}")
  }

  test("cross-family flip: when the floor is low enough for lsh_mp, the " +
      "cheapest probed fraction wins regardless of family") {
    // a 16-bucket banding probes 2/16 = 0.125 of the corpus, far below
    // any IVF row's 1/4 minimum on these candidates — so whenever the
    // lsh row meets the floor, the choice rule MUST flip families
    val a = AnnAdvisor.advise(corpus, "vec_id", "embedding", k = 5,
      recallFloor = 0.05, nlists = Seq(4), nprobes = Seq(1, 2),
      sampleQueries = 10, lshConfigs = Seq((4, 1, 1)))
    val lsh = a.table.find(_.quantizer == "lsh_mp").get
    assert(lsh.probedFraction == 0.125)
    assert(a.table.filter(_.quantizer != "lsh_mp")
      .forall(_.probedFraction > lsh.probedFraction))
    val c = a.chosen.getOrElse(fail("nothing met the 0.05 floor"))
    if (lsh.recall >= 0.05)
      assert(c.quantizer == "lsh_mp",
        s"cheapest qualifying row is lsh_mp, chose $c in ${a.table}")
    else assert(c.probedFraction >= lsh.probedFraction)
  }

  test("lsh grid amortization: one signing pass serves every (tables, " +
      "probes) candidate at a bit width — prefix property + pinned plan") {
    // the cosine kernels take array<double> (the advisor casts at
    // ingress; this spec drives LshAnn directly)
    val dcorpus = corpus.withColumn("embedding",
      col("embedding").cast("array<double>"))
    val queries = dcorpus.filter(col("vec_id") < 8)
    // ≥3 candidates at ONE bit width, mixed table counts (the VERDICT
    // shape): the advisor signs once at maxTables = 4
    val grid = Seq((6, 1, 4), (6, 2, 2), (6, 4, 1), (6, 4, 5))
    val csig = LshAnn.bucketed(dcorpus, "vec_id", "embedding",
      numBits = 6, numTables = 4).localCheckpoint(true)
    // the pinned frame is a checkpoint scan: NO signature expression
    // survives in the plan the per-candidate searches consume, so
    // re-signing is structurally impossible (the one-pass claim)
    val planStr = csig.filter(col("tbl") < 2)
      .queryExecution.optimizedPlan.toString
    assert(!planStr.contains("vec_lsh_signatures"),
      s"signature expression still in the pinned plan:\n$planStr")
    assert(planStr.contains("LogicalRDD") || planStr.contains("Scan"),
      s"expected a checkpoint scan:\n$planStr")
    for ((bits, tables, mp) <- grid) {
      val viaGrid = LshAnn.searchBucketed(csig, queries, "vec_id",
          "embedding", k = 5, numBits = bits, numTables = tables,
          multiProbe = mp)
        .select("query_id", "neighbor_id", "rank")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val direct = LshAnn.search(dcorpus, queries, "vec_id", "embedding",
          k = 5, numBits = bits, numTables = tables, multiProbe = mp)
        .select("query_id", "neighbor_id", "rank")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      // tbl < T prefix of the 4-table frame ≡ signing with T tables
      assert(viaGrid == direct,
        s"prefix reuse diverged at T=$tables mp=$mp")
    }
    // and the advisor's grid path returns the same rows as per-config
    // direct measurement (same corpus, same sample, same ground truth)
    val grouped = AnnAdvisor.advise(corpus, "vec_id", "embedding", k = 5,
      recallFloor = 0.5, nlists = Seq(4), nprobes = Seq(1),
      sampleQueries = 10, lshConfigs = grid)
    val single = grid.map { case cfg =>
      AnnAdvisor.advise(corpus, "vec_id", "embedding", k = 5,
        recallFloor = 0.5, nlists = Seq(4), nprobes = Seq(1),
        sampleQueries = 10, lshConfigs = Seq(cfg))
        .table.filter(_.quantizer == "lsh_mp")
    }
    assert(grouped.table.filter(_.quantizer == "lsh_mp").toSet ==
      single.flatten.toSet)
  }

  test("impossible floor: chosen is None, the table still reports") {
    val a = AnnAdvisor.advise(corpus, "vec_id", "embedding", k = 5,
      recallFloor = 1.0, nlists = Seq(4), nprobes = Seq(1),
      sampleQueries = 8)
    // nprobe 1 of 4 on jittered clusters rarely hits exactly 1.0; if it
    // does, chosen is legitimately defined — assert consistency instead
    // of a brittle None
    a.chosen match {
      case Some(c) => assert(c.recall == 1.0)
      case None    => assert(a.table.forall(_.recall < 1.0))
    }
    val b = AnnAdvisor.advise(corpus, "vec_id", "embedding", k = 5,
      recallFloor = 0.999999, nlists = Seq(4), nprobes = Seq(1, 2, 4),
      sampleQueries = 8)
    // nprobe = nlist is exhaustive probing: recall 1.0 by construction,
    // so SOME configuration always qualifies at any floor <= 1
    assert(b.chosen.isDefined)
    assert(b.table.exists(m => m.nprobe == 4 && m.recall == 1.0))
  }
}
