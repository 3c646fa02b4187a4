package graft.joins

import graft.SparkSuite
import graft.core.IntervalSpec
import org.apache.spark.sql.functions._

/** Interval anti-join: complement-of-match semantics, binned-path
  * equivalence, schema preservation. */
class IntervalAntiJoinSpec extends SparkSuite {
  import spark.implicits._

  test("anti join = left rows minus matched ids (hand fixture, keys)") {
    val pts = Seq(
      (0L, 1, 5.0), (1L, 1, 15.0), (2L, 1, 25.0),
      (3L, 2, 5.0),                       // group 2 has no intervals at 5
      (4L, 3, 1.0)).toDF("pid", "g", "p") // group 3 absent from intervals
    val ivs = Seq(
      (10L, 1, 0.0, 10.0), (11L, 1, 20.0, 30.0),
      (12L, 2, 6.0, 7.0)).toDF("iid", "g", "s", "e")
    val got = IntervalAntiJoin(pts, ivs,
      leftSpec = IntervalSpec.point("p"),
      rightSpec = IntervalSpec.closed("s", "e"),
      on = Seq("g"))
      .select("pid").as[Long].collect().toSet
    assert(got == Set(1L, 3L, 4L))
    // schema preserved exactly
    assert(IntervalAntiJoin(pts, ivs,
      leftSpec = IntervalSpec.point("p"),
      rightSpec = IntervalSpec.closed("s", "e"),
      on = Seq("g")).columns.toSeq == Seq("pid", "g", "p"))
  }

  test("anti ≡ complement of inner match set (random, keyless + binned)") {
    val rnd = new scala.util.Random(13)
    val pts = (0 until 150).map(i => (i.toLong, rnd.nextDouble() * 100))
      .toDF("pid", "p")
    val ivs = (0 until 40).map { i =>
      val s = rnd.nextDouble() * 100
      (i.toLong, s, s + rnd.nextDouble() * 8)
    }.toDF("iid", "s", "e")

    val matched = IntervalJoin(pts, ivs,
      leftSpec = IntervalSpec.point("p"),
      rightSpec = IntervalSpec.closed("s", "e"),
      keepOrder = false)
      .select("pid").as[Long].collect().toSet
    val want = (0L until 150L).toSet -- matched

    val keyless = IntervalAntiJoin(pts, ivs,
      leftSpec = IntervalSpec.point("p"),
      rightSpec = IntervalSpec.closed("s", "e"))
      .select("pid").as[Long].collect().toSet
    assert(keyless == want)

    val binned = IntervalAntiJoin(pts, ivs,
      leftSpec = IntervalSpec.point("p"),
      rightSpec = IntervalSpec.closed("s", "e"),
      binWidth = Some(5.0))
      .select("pid").as[Long].collect().toSet
    assert(binned == want)
  }

  test("open endpoints carry over: boundary points survive strict intervals") {
    val pts = Seq((0L, 0.0), (1L, 5.0), (2L, 10.0), (3L, 7.0)).toDF("pid", "p")
    val ivs = Seq((0L, 0.0, 10.0)).toDF("iid", "s", "e")
    val got = IntervalAntiJoin(pts, ivs,
      leftSpec = IntervalSpec.point("p"),
      rightSpec = IntervalSpec(Some("s"), Some("e"),
        includeStart = false, includeStop = false))
      .select("pid").as[Long].collect().toSet
    assert(got == Set(0L, 2L)) // boundaries excluded from (0,10), so they survive
  }
}
