package graft.dedup

import graft.SparkSuite
import graft.text.Shingles
import org.apache.spark.sql.functions._

/** The MinHash-LSH banding advisor: its exact pair set must equal brute
  * force, recall must reach 1.0 at r = 1 banding on near-twins, the
  * choice rule must be minimal over the measured candidate bill, and
  * everything must be deterministic under repartitioning.
  */
class LshAdvisorSpec extends SparkSuite {
  import spark.implicits._

  // 12 base documents of 30 distinct tokens each; every third doc gets a
  // near-twin (last 3 tokens replaced -> 3-gram Jaccard ~ (28-9)/(28+9)
  // well below 0.8... so make twins differ in ONE token: 3 changed
  // grams of 28 -> J = 25/31 ~ 0.81) plus unrelated fillers
  private def corpus = {
    def words(seed: Int, n: Int) =
      (0 until n).map(j => s"w${seed * 100 + j}")
    val bases = (0 until 12).map { i =>
      (i.toLong, words(i, 30).mkString(" "))
    }
    val twins = (0 until 12).collect { case i if i % 3 == 0 =>
      val w = words(i, 30).updated(15, "CHANGED")
      (100L + i, w.mkString(" "))
    }
    (bases ++ twins).toDF("doc_id", "text")
  }

  test("exact pair set matches brute force; twin recall 1.0 at r = 1") {
    val a = LshAdvisor.advise(corpus, "text", "doc_id",
      numHashes = 16, shingleN = 3, threshold = 0.8, recallFloor = 0.99,
      bandCandidates = Seq(1, 2, 4, 8, 16), sampleDocs = 100)
    // brute-force exact truth on the same fixture
    val g = corpus.select(col("doc_id"),
        Shingles.tokens(col("text")).as("tk"))
      .select(col("doc_id"), Shingles.wordNGramsFromTokens(col("tk"), 3).as("sh"))
    val brute = g.as("a").join(g.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(Shingles.jaccard(col("a.sh"), col("b.sh")).as("j"))
      .filter(col("j") >= 0.8).count()
    assert(brute == 4, s"fixture should plant 4 twin pairs, got $brute")
    assert(a.table.forall(_.truePairs == brute))
    // 16 bands of r = 1: collision prob 1-(1-J)^16 > 0.9999 at J >= 0.8
    val b16 = a.table.find(_.numBands == 16).get
    assert(b16.recall == 1.0, s"r=1 banding must catch all twins: $b16")
    // the S-curve anchor is monotone in b at fixed k
    val curves = a.table.sortBy(_.numBands).map(_.sCurve)
    assert(curves == curves.sorted)
    // chosen = minimal candidate bill among qualifying rows
    val c = a.chosen.getOrElse(fail(s"no config met 0.99: ${a.table}"))
    val qualifying = a.table.filter(_.recall >= 0.99)
    assert(qualifying.forall(_.candidates >= c.candidates),
      s"chosen $c not minimal among $qualifying")
  }

  test("deterministic under repartitioning") {
    def run(parts: Int) = LshAdvisor.advise(
      corpus.repartition(parts), "text", "doc_id",
      numHashes = 8, shingleN = 3, threshold = 0.8, recallFloor = 0.5,
      bandCandidates = Seq(2, 8), sampleDocs = 100)
    val (a, b) = (run(1), run(7))
    assert(a.table == b.table)
    assert(a.chosen == b.chosen)
  }

  test("impossible floor is an honest None; sample bound respected") {
    // r = 8 single band on J ~ 0.81 twins: expected collision ~ 0.19 —
    // essentially never all four, and the floor demands 1.0
    val a = LshAdvisor.advise(corpus, "text", "doc_id",
      numHashes = 8, shingleN = 3, threshold = 0.8, recallFloor = 1.0,
      bandCandidates = Seq(1), sampleDocs = 100)
    a.chosen match {
      case Some(c) => assert(c.recall == 1.0)
      case None    => assert(a.table.forall(_.recall < 1.0))
    }
    // sampleDocs caps the measured universe: with 2 docs sampled there
    // is at most one pair anywhere in the counts
    val s = LshAdvisor.advise(corpus, "text", "doc_id",
      numHashes = 8, shingleN = 3, threshold = 0.8, recallFloor = 0.5,
      bandCandidates = Seq(8), sampleDocs = 2)
    assert(s.table.forall(m => m.truePairs <= 1 && m.candidates <= 1))
  }

  test("production MinHashDedup at the chosen banding finds the twins") {
    val a = LshAdvisor.advise(corpus, "text", "doc_id",
      numHashes = 16, shingleN = 3, threshold = 0.8, recallFloor = 0.99,
      bandCandidates = Seq(1, 2, 4, 8, 16), sampleDocs = 100)
    val c = a.chosen.get
    // the advice transfers to the xxhash64 production path: the chosen
    // (b, r) recovers the exact pair set on the same fixture
    val prod = MinHashDedup(corpus, "text", "doc_id",
      numHashes = 16, numBands = c.numBands, shingleN = 3, threshold = 0.8)
    assert(prod.count() == c.truePairs)
  }
}
