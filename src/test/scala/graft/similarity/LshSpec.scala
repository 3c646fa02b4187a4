package graft.similarity

import graft.SparkSuite

/** Unit specs for the LSH hyperplane derivation (`LshAnn.hcomp`). */
class LshSpec extends SparkSuite {

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
