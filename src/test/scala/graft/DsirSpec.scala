package graft

import graft.sample.Dsir
import org.apache.spark.sql.functions._

/** DSIR importance resampling: weight math checked against an
  * independent in-test implementation of the same formula (tokenize →
  * hash → smoothed log-ratio → per-doc sum), selection checked for
  * domain affinity and seed determinism.
  */
class DsirSpec extends SparkSuite {
  import spark.implicits._

  // the corpus: "physics" docs share a domain vocabulary; "cooking"
  // docs another; a few mixed docs sit in between
  private def corpus = Seq(
    (1L, "quantum field theory lattice gauge simulation"),
    (2L, "quantum entanglement decoherence qubit lattice"),
    (3L, "gauge symmetry breaking higgs quantum vacuum"),
    (4L, "slow roasted garlic butter chicken recipe"),
    (5L, "sourdough starter hydration baking schedule"),
    (6L, "garlic butter shrimp pasta recipe dinner"),
    (7L, "quantum cooking sous vide precision temperature"),
    (8L, "lattice pie crust butter recipe baking"),
    (9L, "qubit error correction surface code lattice"),
    (10L, "chicken stock reduction sauce butter")
  ).toDF("id", "text")

  private val B = 64
  private val K = 1.0

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def bucket(g: String): Long =
    java.lang.Long.parseLong(md5Hex("dsir#" + g).substring(0, 15), 16) % B

  private def feats(text: String): Map[Long, Long] = {
    val tk = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    val grams = tk ++ tk.zip(tk.drop(1)).map { case (a, b) => s"$a $b" }
    grams.groupBy(bucket).map { case (b, g) => b -> g.size.toLong }
  }

  test("importance weights match an independent implementation") {
    val target = corpus.filter(col("id") <= 3)   // physics target
    val raw = corpus.filter(col("id") > 3)
    val got = Dsir.importanceWeights(raw, target, "id", "text",
      buckets = B, k = K)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList

    val data = corpus.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val tFeats = (1L to 3L).map(data).map(feats)
    val rIds = (4L to 10L)
    val rFeats = rIds.map(i => i -> feats(data(i))).toMap
    def counts(ms: Iterable[Map[Long, Long]]): Map[Long, Long] =
      ms.flatten.groupBy(_._1).map { case (b, xs) => b -> xs.map(_._2).sum }
    val tc = counts(tFeats); val rc = counts(rFeats.values)
    val tt = tc.values.sum.toDouble; val rt = rc.values.sum.toDouble
    def lw(f: Map[Long, Long]): Double = f.map { case (b, c) =>
      c * (math.log((tc.getOrElse(b, 0L) + K) / (tt + K * B)) -
           math.log((rc.getOrElse(b, 0L) + K) / (rt + K * B)))
    }.sum
    val want = rIds.map(i =>
      (i, rFeats(i).values.sum, lw(rFeats(i)))).toList
    assert(got.map(t => (t._1, t._2)).toSet == want.map(t => (t._1, t._2)).toSet)
    val wantW = want.map(t => t._1 -> t._3).toMap
    got.foreach { case (i, _, w) =>
      assert(math.abs(w - wantW(i)) < 1e-9, s"doc $i: $w vs ${wantW(i)}")
    }
  }

  test("resample prefers in-domain docs, deterministic in seed") {
    val target = corpus.filter(col("id") <= 3)
    val raw = corpus.filter(col("id") > 3)
    val top3 = Dsir.resample(raw, target, "id", "text", n = 3,
      seed = 42L, buckets = B, k = K)
      .select("id").as[Long].collect().toSet
    // the physics-adjacent raw docs (quantum/qubit/lattice vocabulary)
    // must dominate the selection over pure cooking docs
    assert(top3.intersect(Set(7L, 8L, 9L)).size >= 2, top3)
    val again = Dsir.resample(raw.repartition(5), target, "id", "text",
      n = 3, seed = 42L, buckets = B, k = K)
      .select("id").as[Long].collect().toSet
    assert(again == top3)
  }

  test("argument guards") {
    intercept[IllegalArgumentException](
      Dsir.resample(corpus, corpus, "id", "text", n = 0))
    intercept[IllegalArgumentException](
      Dsir.importanceWeights(corpus, corpus, "id", "text", buckets = 0))
    intercept[IllegalArgumentException](
      Dsir.importanceWeights(corpus, corpus, "id", "text", k = 0.0))
  }
}
