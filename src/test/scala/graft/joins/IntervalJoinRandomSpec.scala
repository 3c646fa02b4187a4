package graft.joins

import graft.SparkSuite
import graft.core.IntervalSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Randomized differential testing of IntervalJoin à la the reference's
  * seeded sweeps (`tests/test_merge_intervals.py:235-275`): random
  * intervals with NaN/degenerate cases, every closedness combo and
  * how/keep mode, compared against a brute-force cross-join + predicate
  * oracle computed independently below.
  */
case class RandIv(id: Long, g: Int, s: java.lang.Double, e: java.lang.Double)

class IntervalJoinRandomSpec extends SparkSuite {
  import spark.implicits._

  private type Iv = RandIv
  private def Iv(id: Long, g: Int, s: java.lang.Double, e: java.lang.Double) =
    RandIv(id, g, s, e)

  private def gen(seed: Int, n: Int): Seq[Iv] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val g = rnd.nextInt(3)
      val s = rnd.nextInt(10).toDouble
      val len = rnd.nextInt(4) - 1 // -1 → inverted (empty), 0 → point
      val sOpt: java.lang.Double = if (rnd.nextInt(10) == 0) null else s
      val eOpt: java.lang.Double =
        if (rnd.nextInt(10) == 0) null else s + len
      Iv(i.toLong, g, sOpt, eOpt)
    }
  }

  /** Brute-force oracle: all matching (lid, rid) pairs. */
  private def oracle(
      ls: Seq[Iv], rs: Seq[Iv],
      incLs: Boolean, incLe: Boolean, incRs: Boolean, incRe: Boolean): Set[(Long, Long)] = {
    def valid(v: Iv, incS: Boolean, incE: Boolean): Boolean =
      v.s != null && v.e != null &&
        (if (incS && incE) v.s <= v.e else v.s < v.e)
    (for {
      a <- ls if valid(a, incLs, incLe)
      b <- rs if valid(b, incRs, incRe)
      c1 = if (incLs && incRe) a.s <= b.e else a.s < b.e
      c2 = if (incRs && incLe) b.s <= a.e else b.s < a.e
      if a.g == b.g && c1 && c2
    } yield (a.id, b.id)).toSet
  }

  private def run(
      l: DataFrame, r: DataFrame,
      incLs: Boolean, incLe: Boolean, incRs: Boolean, incRe: Boolean,
      how: String, keep: String): Seq[(Option[Long], Option[Long])] =
    IntervalJoin(
      l, r,
      leftSpec = IntervalSpec(Some("s"), Some("e"), incLs, incLe),
      rightSpec = IntervalSpec(Some("s"), Some("e"), incRs, incRe),
      on = Seq("g"), how = how, keep = keep, keepOrder = false,
      leftIdCol = Some("id"), rightIdCol = Some("id"))
      .select(col("id_x"), col("id_y"))
      .collect()
      .map(row => (Option(row.get(0)).map(_.asInstanceOf[Long]),
        Option(row.get(1)).map(_.asInstanceOf[Long]))).toSeq

  test("randomized: all closedness combos vs brute-force oracle (inner/all)") {
    for (seed <- Seq(1, 2, 3)) {
      val ls = gen(seed, 40)
      val rs = gen(seed + 100, 30)
      val (ldf, rdf) = (ls.toDF(), rs.toDF())
      for {
        incLs <- Seq(true, false); incLe <- Seq(true, false)
        incRs <- Seq(true, false); incRe <- Seq(true, false)
      } {
        val got = run(ldf, rdf, incLs, incLe, incRs, incRe, "inner", "all")
          .map(p => (p._1.get, p._2.get)).toSet
        val want = oracle(ls, rs, incLs, incLe, incRs, incRe)
        assert(got == want,
          s"seed=$seed closed=($incLs,$incLe,$incRs,$incRe)")
      }
    }
  }

  test("randomized: half-unbounded left side (missing start column) vs oracle") {
    // leftSpec = (-inf, e]: matches right [s,e'] iff s <= e (and both valid)
    val ls = gen(91, 35)
    val rs = gen(291, 30)
    val got = IntervalJoin(
      ls.toDF().drop("s"), rs.toDF(),
      leftSpec = IntervalSpec(None, Some("e")),
      rightSpec = IntervalSpec(Some("s"), Some("e")),
      on = Seq("g"), keepOrder = false,
      leftIdCol = Some("id"), rightIdCol = Some("id"))
      .select(col("id_x"), col("id_y"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      a <- ls if a.e != null
      b <- rs if b.s != null && b.e != null && b.s <= b.e
      if a.g == b.g && b.s <= a.e
    } yield (a.id, b.id)).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("randomized: how=left/outer row accounting and keep=first/last/both") {
    val ls = gen(7, 30)
    val rs = gen(207, 25)
    val (ldf, rdf) = (ls.toDF(), rs.toDF())
    val want = oracle(ls, rs, incLs = true, incLe = true, incRs = true, incRe = true)

    // how=left: every left id appears; unmatched get null right
    val leftRows = run(ldf, rdf, true, true, true, true, "left", "all")
    assert(leftRows.flatMap(_._1).toSet == ls.map(_.id).toSet)
    assert(leftRows.filter(_._2.isDefined)
      .map(p => (p._1.get, p._2.get)).toSet == want)

    // how=outer: both sides' ids all appear
    val outerRows = run(ldf, rdf, true, true, true, true, "outer", "all")
    assert(outerRows.flatMap(_._1).toSet == ls.map(_.id).toSet)
    assert(outerRows.flatMap(_._2).toSet == rs.map(_.id).toSet)

    // keep=first/last: per left id, min/max matching right id
    val byLeft = want.groupBy(_._1)
    val first = run(ldf, rdf, true, true, true, true, "inner", "first")
      .map(p => (p._1.get, p._2.get))
    assert(first.toSet == byLeft.map { case (l0, ps) => (l0, ps.map(_._2).min) }.toSet)
    assert(first.size == byLeft.size) // exactly one row per matched left
    val last = run(ldf, rdf, true, true, true, true, "inner", "last")
      .map(p => (p._1.get, p._2.get)).toSet
    assert(last == byLeft.map { case (l0, ps) => (l0, ps.map(_._2).max) }.toSet)
    // keep=both: first ∪ last (single row when equal)
    val both = run(ldf, rdf, true, true, true, true, "inner", "both")
      .map(p => (p._1.get, p._2.get))
    assert(both.toSet == (first.toSet ++ last))
    assert(both.size == both.toSet.size)
  }
}
