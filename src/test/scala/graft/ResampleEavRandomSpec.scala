package graft

import graft.resample.ResampleEav
import org.apache.spark.sql.functions._

case class RandObs(e: Int, t: java.lang.Double, attr: String, v: java.lang.Double)
case class RandWin(e: Int, ws: java.lang.Double, wt: java.lang.Double)

/** Randomized differential testing of resample_eav across window patterns
  * (overlapping / inverted / NA-endpoint windows, NaN values, NA times) —
  * the reference's sweep strategy (`tests/test_resample_eav.py:71-132`)
  * with a Scala brute-force oracle.
  */
class ResampleEavRandomSpec extends SparkSuite {
  import spark.implicits._

  private def genObs(seed: Int, n: Int): Seq[RandObs] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { _ =>
      RandObs(
        rnd.nextInt(4),
        rnd.nextInt(12) match {
          case 0 => null
          case 1 => Double.NaN // NA time: ignored entirely
          case _ => rnd.nextInt(20).toDouble
        },
        if (rnd.nextBoolean()) "a" else "b",
        rnd.nextInt(10) match {
          case 0 => null
          case 1 => Double.NaN
          case k => k.toDouble
        })
    }
  }

  private def genWins(seed: Int, n: Int): Seq[RandWin] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { _ =>
      val s = rnd.nextInt(20).toDouble
      val len = rnd.nextInt(12) - 2 // may be inverted
      def na(v: Double): java.lang.Double = rnd.nextInt(10) match {
        case 0 => null
        case 1 => Double.NaN // NaN endpoint: window invalid
        case _ => v
      }
      RandWin(rnd.nextInt(5), na(s), na(s + len))
    }
  }

  private def isNa(x: java.lang.Double): Boolean = x == null || x.isNaN

  test("randomized: count/sum/min/max/size/r0 vs brute-force oracle") {
    for (seed <- Seq(11, 12, 13)) {
      val obs = genObs(seed, 120)
      val wins = genWins(seed + 50, 40)
      val out = ResampleEav(
        obs.toDF("e", "t", "attr", "v"), wins.toDF("e", "ws", "wt"),
        agg = Map("a" -> Seq("count", "sum", "min", "max", "size", "r0",
          "p30", "median")),
        timeCol = "t", valueCol = "v", entityCol = Some("e"),
        attrCol = Some("attr"), wStartCol = Some("ws"), wStopCol = Some("wt"))
        .orderBy(col("ws").asc_nulls_last, col("wt").asc_nulls_last, col("e"))
        .collect()

      // match Spark's asc_nulls_last with NaN sorting above +Inf
      def sortKey(x: java.lang.Double): (Int, Double) =
        if (x == null) (2, 0.0)
        else if (x.isNaN) (1, 0.0)
        else (0, x.doubleValue)
      val sortedWins = wins.sortBy(w => (sortKey(w.ws), sortKey(w.wt), w.e))
      assert(out.length == wins.length)

      sortedWins.zip(out).foreach { case (w, row) =>
        // oracle: [ws, wt) containment, invalid window ⇒ nothing
        val inWin: Seq[RandObs] =
          if (isNa(w.ws) || isNa(w.wt)) Seq.empty
          else obs.filter(o => o.e == w.e && o.attr == "a" && !isNa(o.t) &&
            o.t >= w.ws && o.t < w.wt)
        val vals = inWin.map(_.v)
          .filter(x => x != null && !x.isNaN).map(_.doubleValue)
        assert(row.getAs[Long]("a_size") == inWin.size,
          s"seed=$seed w=$w size")
        assert(row.getAs[Long]("a_count") == vals.size, s"seed=$seed w=$w count")
        // pandas linear-interpolation percentile oracle
        def pct(q: Double): Double = {
          val s = vals.sorted
          val pos = (s.size - 1) * q
          val lo = math.floor(pos).toInt
          val hi = math.ceil(pos).toInt
          s(lo) + (s(hi) - s(lo)) * (pos - lo)
        }
        if (vals.nonEmpty) {
          assert(math.abs(row.getAs[Double]("a_sum") - vals.sum) < 1e-9)
          assert(row.getAs[Double]("a_min") == vals.min)
          assert(row.getAs[Double]("a_max") == vals.max)
          assert(math.abs(row.getAs[Double]("a_p30") - pct(0.3)) < 1e-9,
            s"seed=$seed w=$w p30")
          assert(math.abs(row.getAs[Double]("a_median") - pct(0.5)) < 1e-9,
            s"seed=$seed w=$w median")
        } else {
          assert(row.isNullAt(row.fieldIndex("a_sum")), s"seed=$seed w=$w sum")
          assert(row.isNullAt(row.fieldIndex("a_p30")), s"seed=$seed w=$w p30")
        }
        // r0: value of the earliest observation (any value incl. null/NaN),
        // ties by stable input order make the value ambiguous only if the
        // tied values differ — restrict the check to unique-minimum times
        if (inWin.nonEmpty) {
          val tmin = inWin.map(_.t.doubleValue).min
          val atMin = inWin.filter(_.t == tmin)
          if (atMin.size == 1) {
            val exp = atMin.head.v
            if (exp == null || exp.isNaN)
              assert(row.isNullAt(row.fieldIndex("a_r0")))
            else assert(row.getAs[Double]("a_r0") == exp.doubleValue)
          }
        } else assert(row.isNullAt(row.fieldIndex("a_r0")))
      }
    }
  }
}
