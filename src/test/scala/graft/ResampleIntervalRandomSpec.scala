package graft

import graft.resample.ResampleInterval
import org.apache.spark.sql.functions._

case class RandRi(e: Int, a: java.lang.Double, b: java.lang.Double, v: java.lang.Double)
case class RandRw(e: Int, ws: java.lang.Double, wt: java.lang.Double)

/** Randomized differential testing of resample_interval vs a Scala
  * brute-force oracle implementing the fraction conventions of
  * `resampling.py:541-568` (the reference's `resample_interval_slow`,
  * `tests/util.py:133-269`): zero-length and ±∞ intervals, NA values,
  * inverted intervals, invalid windows.
  */
class ResampleIntervalRandomSpec extends SparkSuite {
  import spark.implicits._

  private val Inf = Double.PositiveInfinity
  private val Eps = 1e-7

  private def gen(seed: Int): (Seq[RandRi], Seq[RandRw]) = {
    val rnd = new scala.util.Random(seed)
    def endpoint(base: Double): java.lang.Double = rnd.nextInt(12) match {
      case 0 => null
      case 1 => if (rnd.nextBoolean()) Inf else -Inf
      case _ => base
    }
    val ivs = (0 until 80).map { _ =>
      val s = rnd.nextInt(15).toDouble
      RandRi(rnd.nextInt(3),
        endpoint(s), endpoint(s + rnd.nextInt(5) - 1),
        if (rnd.nextInt(8) == 0) null else (rnd.nextInt(9) - 4).toDouble)
    }
    val wins = (0 until 30).map { _ =>
      val s = rnd.nextInt(15).toDouble
      RandRw(rnd.nextInt(4), endpoint(s), endpoint(s + rnd.nextInt(8)))
    }
    (ivs, wins)
  }

  /** Oracle contribution of interval [a,b],v to window [s,t]. */
  private def contrib(a: Double, b: Double, v: Double, s: Double, t: Double): Double = {
    if (a > b || !(a <= t && s <= b)) 0.0 // empty or no overlap (closed)
    else {
      val is = math.max(a, s); val it = math.min(b, t)
      val iDurInf = (b - a).isPosInfinity || a.isNegInfinity && b.isInfinite
      val interInf = is.isNegInfinity || it.isPosInfinity
      if (a.isNegInfinity || b.isPosInfinity) {
        if (interInf) v else Eps * math.signum(v)
      } else if (a == b) v // point interval inside (overlap already checked)
      else v * (it - is) / (b - a)
    }
  }

  test("randomized: fraction conventions vs brute-force oracle") {
    for (seed <- Seq(21, 22, 23)) {
      val (ivs, wins) = gen(seed)
      val out = ResampleInterval(
        ivs.toDF("e", "a", "b", "v"), wins.toDF("e", "ws", "wt"),
        valueCol = "v", entityCol = Some("e"),
        startCol = Some("a"), stopCol = Some("b"),
        attributes = Some(Seq("s")),
        wStartCol = Some("ws"), wStopCol = Some("wt"), epsilon = Eps)
        .orderBy(col("ws").asc_nulls_last, col("wt").asc_nulls_last, col("e"))
        .collect()

      def sortKey(x: java.lang.Double): (Int, Double) =
        if (x == null) (2, 0.0) else if (x.isNaN) (1, 0.0) else (0, x.doubleValue)
      val sortedWins = wins.sortBy(w => (sortKey(w.ws), sortKey(w.wt), w.e))
      assert(out.length == wins.length)

      sortedWins.zip(out).foreach { case (w, row) =>
        val expected: Double =
          if (w.ws == null || w.wt == null) 0.0
          else ivs.filter(i => i.e == w.e &&
              i.a != null && i.b != null && i.v != null)
            .map(i => contrib(i.a, i.b, i.v, w.ws, w.wt))
            .sum
        val got = row.getAs[Double]("s")
        assert(math.abs(got - expected) < 1e-9,
          s"seed=$seed w=$w got=$got want=$expected")
      }
    }
  }
}
