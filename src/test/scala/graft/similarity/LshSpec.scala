package graft.similarity

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Unit specs for the LSH hyperplane derivation (`LshAnn.hcomp`) and the
  * native signature expression. */
class LshSpec extends SparkSuite {
  import spark.implicits._

  test("vec_lsh_signatures ≡ composed per-bit when(vec_dot > 0) form") {
    val rnd = new scala.util.Random(29)
    val numBits = 6; val numTables = 8; val dim = 16
    val rows = ((0 until 300).map(i =>
      (i.toLong, Seq.fill(dim)(rnd.nextDouble() * 2 - 1))) :+
      (999L, Seq.fill(dim)(0.0))) // zero vector: every dot = 0 → sig 0
      .toDF("id", "v")
    // the pre-round-9 composed implementation, verbatim semantics
    def legacySig(t: Int) =
      (0 until numBits).map { i =>
        val h = typedLit((0 until dim).map(d => LshAnn.hcomp(t, i, d)))
        when(VectorOps.dot(col("v"), h) > 0, lit(1L << i)).otherwise(0L)
      }.reduce(_ + _)
    val out = rows.select(col("id"),
      LshAnn.signatures(col("v"), numBits, numTables, dim).as("ns"),
      array((0 until numTables).map(legacySig): _*).as("ls")).collect()
    for (r <- out)
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"id=${r.getLong(0)}")
    assert(out.find(_.getLong(0) == 999L).get.getSeq[Long](1)
      .forall(_ == 0L))
  }

  test("hcomp stays in [-1,1) and matches 64-bit modular arithmetic at any dim") {
    // ADVICE r2 regression: the Int mix overflowed at dimension ≈ 1650,
    // flipping the Java % sign — components left [-1,1) and diverged from
    // the BIGINT SQL oracle. The Long mix must agree with exact (BigInt)
    // arithmetic everywhere.
    for (t <- 0 until 8; i <- Seq(0, 5, 15);
         d <- Seq(0, 1, 1649, 1650, 4095, 100000)) {
      val v = LshAnn.hcomp(t, i, d)
      assert(v >= -1.0 && v < 1.0, s"t=$t i=$i d=$d v=$v")
      val m = (BigInt(t + 1) * 7919 + BigInt(i + 1) * 104729 +
        BigInt(d + 1) * 1299709) % 1000003
      val want = (m % 2001).toDouble / 1000.0 - 1.0
      assert(v == want, s"t=$t i=$i d=$d")
    }
  }
}
