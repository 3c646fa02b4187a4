package graft.similarity

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Randomized differential test for multi-probe LSH search with an
  * INDEPENDENT sequential oracle: plain-Scala loops recompute
  * hyperplane dots, base signatures, margin-ordered flips, bucket
  * membership, and the exact-cosine top-k — no Spark expressions
  * shared with the plan under test (the [[graft.RandomizedOracleSpecs]]
  * method applied to the ANN family).
  */
class MultiProbeRandomSpec extends SparkSuite {
  import spark.implicits._

  // the same public recipe the engine uses; evaluated with plain loops
  private def hcomp(t: Int, i: Int, d: Int): Double = {
    val m = ((t + 1).toLong * 7919L + (i + 1).toLong * 104729L +
      (d + 1).toLong * 1299709L) % 1000003L
    (m % 2001L) / 1000.0 - 1.0
  }

  private def sequentialSearch(
      corpus: Seq[(Long, Array[Double])], queries: Seq[(Long, Array[Double])],
      k: Int, numBits: Int, numTables: Int, multiProbe: Int)
      : Set[(Long, Long, Int)] = {
    val dim = corpus.head._2.length
    def dot(v: Array[Double], t: Int, i: Int): Double = {
      var s = 0.0; var d = 0
      while (d < dim) { s += v(d) * hcomp(t, i, d); d += 1 }; s
    }
    def sig(v: Array[Double], t: Int): Long =
      (0 until numBits).foldLeft(0L)((acc, i) =>
        if (dot(v, t, i) > 0) acc | (1L << i) else acc)
    val buckets: Map[(Int, Long), Seq[Long]] = corpus
      .flatMap { case (id, v) => (0 until numTables).map(t => ((t, sig(v, t)), id)) }
      .groupBy(_._1).map { case (key, xs) => key -> xs.map(_._2) }
    def cosine(a: Array[Double], b: Array[Double]): Double = {
      var dp = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < dim) { dp += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      val den = math.sqrt(na) * math.sqrt(nb)
      if (den == 0) 0.0 else dp / den
    }
    val byId = corpus.toMap
    queries.flatMap { case (qid, qv) =>
      val cands = (0 until numTables).flatMap { t =>
        val base = sig(qv, t)
        val flips = (0 until numBits)
          .map(i => (math.abs(dot(qv, t, i)), i)).sorted.take(multiProbe)
          .map { case (_, b) => base ^ (1L << b) }
        (base +: flips).flatMap(s => buckets.getOrElse((t, s), Nil))
      }.distinct.filter(_ != qid)
      cands.map(nid => (nid, cosine(qv, byId(nid))))
        .sortBy { case (nid, c) => (-c, nid) }
        .take(k).zipWithIndex
        .map { case ((nid, _), r) => (qid, nid, r + 1) }
    }.toSet
  }

  test("engine ≡ sequential oracle across random shapes") {
    for (seed <- Seq(11, 12); (nb, nt, mp) <- Seq((6, 2, 2), (4, 1, 4), (8, 3, 0))) {
      val rnd = new scala.util.Random(seed)
      val corpus = (0 until 80).map(i =>
        (i.toLong, Array.fill(12)(rnd.nextDouble() * 2 - 1)))
      val queries = corpus.take(7)
      val cdf = corpus.map { case (id, v) => (id, v.toSeq) }
        .toDF("vec_id", "embedding")
      val qdf = queries.map { case (id, v) => (id, v.toSeq) }
        .toDF("vec_id", "embedding")
      val got = LshAnn.search(cdf, qdf, "vec_id", "embedding",
        k = 5, numBits = nb, numTables = nt, multiProbe = mp)
        .select("query_id", "neighbor_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val want = sequentialSearch(corpus, queries, k = 5,
        numBits = nb, numTables = nt, multiProbe = mp)
      assert(got == want,
        s"seed=$seed nb=$nb nt=$nt mp=$mp: ${got.diff(want)} vs ${want.diff(got)}")
    }
  }

  test("advisor truth ≡ brute-force Jaccard across random corpora") {
    for (seed <- Seq(21, 22)) {
      val rnd = new scala.util.Random(seed)
      // small vocab forces shared shingles (the inverted-index stress)
      val docs = (0 until 40).map { i =>
        (i.toLong, (0 until 12).map(_ => s"w${rnd.nextInt(18)}").mkString(" "))
      }
      val df = docs.toDF("doc_id", "text")
      val a = graft.dedup.LshAdvisor.advise(df, "text", "doc_id",
        numHashes = 8, shingleN = 2, threshold = 0.5, recallFloor = 0.1,
        bandCandidates = Seq(8), sampleDocs = 100)
      // sequential exact: distinct word-2-gram sets, pairwise Jaccard
      def grams(s: String): Set[String] = {
        val tk = s.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
        if (tk.length < 2) Set(tk.mkString(" "))
        else tk.sliding(2).map(_.mkString(" ")).toSet
      }
      val gs = docs.map { case (id, s) => (id, grams(s)) }
      val want = (for {
        (i, gi) <- gs; (j, gj) <- gs if i < j
        inter = gi.intersect(gj).size
        if inter > 0 && inter.toDouble / (gi.size + gj.size - inter) >= 0.5
      } yield 1).size
      assert(a.table.head.truePairs == want,
        s"seed=$seed: advisor ${a.table.head.truePairs} vs brute $want")
    }
  }
}
