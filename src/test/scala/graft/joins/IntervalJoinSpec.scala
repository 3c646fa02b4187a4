package graft.joins

import graft.SparkSuite
import graft.core.IntervalSpec
import org.apache.spark.sql.DataFrame

/** Ports the reference's merge_intervals test suite:
  *   - exhaustive 16 open/closed combos vs a cross-join predicate oracle
  *     (`/root/reference/tests/test_merge_intervals.py:125-198`);
  *   - golden indexers for how ∈ inner/left/right/outer (`:201-232`);
  *   - golden indexers for keep ∈ all/first/last/both (`:386-448`);
  *   - NaN / ±inf endpoint rules (`merging.py:132-139`).
  */
class IntervalJoinSpec extends SparkSuite {
  import spark.implicits._

  private def indexerPairs(df: DataFrame): Seq[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  private def mkDf(rows: Seq[(Double, Double)]): DataFrame =
    rows.zipWithIndex
      .map { case ((a, b), i) => (a, b, i.toLong) }
      .toDF("start", "stop", "i")

  test("exhaustive open/closed combos vs cross-join predicate oracle") {
    val lattice =
      for (a <- 0 to 3; b <- 0 to 3) yield (a.toDouble, b.toDouble)
    val left  = mkDf(lattice)
    val right = mkDf(lattice)

    for {
      ils <- Seq(false, true); ilt <- Seq(false, true)
      irs <- Seq(false, true); irt <- Seq(false, true)
    } {
      val got = indexerPairs(IntervalJoin(
        left, right,
        leftSpec  = IntervalSpec(Some("start"), Some("stop"), ils, ilt),
        rightSpec = IntervalSpec(Some("start"), Some("stop"), irs, irt),
        leftIdCol = Some("i"), rightIdCol = Some("i"),
        keepOrder = false, returnIndexers = true)).toSet

      // oracle: reference's mask logic over the cross product
      val want = (for {
        ((la, lb), li) <- lattice.zipWithIndex
        ((ra, rb), ri) <- lattice.zipWithIndex
      } yield {
        val lEmpty = if (ils && ilt) la > lb else la >= lb
        val rEmpty = if (irs && irt) ra > rb else ra >= rb
        val disj1  = if (ilt && irs) lb < ra else lb <= ra
        val disj2  = if (irt && ils) rb < la else rb <= la
        if (!lEmpty && !rEmpty && !disj1 && !disj2) Some((li.toLong, ri.toLong))
        else None
      }).flatten.toSet

      assert(got == want, s"combo ils=$ils ilt=$ilt irs=$irs irt=$irt")
    }
  }

  test("how golden indexers (test_merge_intervals.py:201-232)") {
    val left  = mkDf(Seq((0d, 2d), (7d, 8d), (1d, 5d), (8d, 9d)))
    val right = mkDf(Seq((10d, 11d), (4d, 5d), (0d, 3d)))
    def run(how: String): Seq[(Long, Long)] = indexerPairs(IntervalJoin(
      left, right,
      leftSpec = IntervalSpec.closed("start", "stop"),
      rightSpec = IntervalSpec.closed("start", "stop"),
      how = how,
      leftIdCol = Some("i"), rightIdCol = Some("i"),
      returnIndexers = true))

    assert(run("inner") == Seq((0L, 2L), (2L, 1L), (2L, 2L)))
    assert(run("left") ==
      Seq((0L, 2L), (1L, -1L), (2L, 1L), (2L, 2L), (3L, -1L)))
    assert(run("right") ==
      Seq((-1L, 0L), (2L, 1L), (0L, 2L), (2L, 2L)))
    assert(run("outer") ==
      Seq((0L, 2L), (1L, -1L), (2L, 1L), (2L, 2L), (3L, -1L), (-1L, 0L)))
  }

  test("keep golden indexers, bounded intervals (test_keep block 1)") {
    val left = mkDf(Seq((4d, 5d), (4d, 6d), (0d, 0d), (2d, 2d), (-7d, -4d), (50d, 52d)))
    val right = mkDf(Seq(
      (1d, 2d), (23d, 24d), (3d, 4d), (-10d, -7d), (10d, 15d), (4d, 4d),
      (-1d, 0d), (-2d, 0d), (3d, 4d), (12d, 14d), (2d, 2d)))
    def run(keep: String): Seq[(Long, Long)] = indexerPairs(IntervalJoin(
      left, right,
      leftSpec = IntervalSpec.closed("start", "stop"),
      rightSpec = IntervalSpec.closed("start", "stop"),
      keep = keep,
      leftIdCol = Some("i"), rightIdCol = Some("i"),
      returnIndexers = true))

    assert(run("all") == Seq(
      (0L, 2L), (0L, 5L), (0L, 8L), (1L, 2L), (1L, 5L), (1L, 8L),
      (2L, 6L), (2L, 7L), (3L, 0L), (3L, 10L), (4L, 3L)))
    assert(run("first") ==
      Seq((0L, 2L), (1L, 2L), (2L, 6L), (3L, 0L), (4L, 3L)))
    assert(run("last") ==
      Seq((0L, 8L), (1L, 8L), (2L, 7L), (3L, 10L), (4L, 3L)))
    assert(run("both") == Seq(
      (0L, 2L), (0L, 8L), (1L, 2L), (1L, 8L), (2L, 6L), (2L, 7L),
      (3L, 0L), (3L, 10L), (4L, 3L)))
  }

  test("keep golden indexers, point right side (test_keep block 2)") {
    val left = mkDf(Seq((-1d, 7d), (-3d, -1d), (1d, 9d), (0d, 5d), (5d, 7d)))
    val right = Seq(0d, 2d, 4d, 6d).zipWithIndex
      .map { case (a, i) => (a, i.toLong) }.toDF("a", "i")
    def run(keep: String): Seq[(Long, Long)] = indexerPairs(IntervalJoin(
      left, right,
      leftSpec = IntervalSpec.closed("start", "stop"),
      rightSpec = IntervalSpec.point("a"),
      keep = keep,
      leftIdCol = Some("i"), rightIdCol = Some("i"),
      returnIndexers = true))

    assert(run("first") == Seq((0L, 0L), (2L, 1L), (3L, 0L), (4L, 3L)))
    assert(run("last") == Seq((0L, 3L), (2L, 3L), (3L, 2L), (4L, 3L)))
    assert(run("both") == Seq(
      (0L, 0L), (0L, 3L), (2L, 1L), (2L, 3L), (3L, 0L), (3L, 2L), (4L, 3L)))
  }

  test("keep golden indexers, proper overlap (test_keep block 3)") {
    val left  = mkDf(Seq((0d, 4d), (-3d, -1d)))
    val right = mkDf(Seq((1d, 4d), (-1d, 2d), (2d, 5d), (-2d, 3d), (1d, 3d), (-4d, -1d)))
    def run(keep: String): Seq[(Long, Long)] = indexerPairs(IntervalJoin(
      left, right,
      leftSpec = IntervalSpec.closed("start", "stop"),
      rightSpec = IntervalSpec.closed("start", "stop"),
      keep = keep,
      leftIdCol = Some("i"), rightIdCol = Some("i"),
      returnIndexers = true))

    assert(run("all") == Seq(
      (0L, 0L), (0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (1L, 1L), (1L, 3L), (1L, 5L)))
    assert(run("first") == Seq((0L, 0L), (1L, 1L)))
    assert(run("last") == Seq((0L, 4L), (1L, 5L)))
    assert(run("both") == Seq((0L, 0L), (0L, 4L), (1L, 1L), (1L, 5L)))
  }

  test("NaN endpoints are empty intervals even vs ±inf") {
    val nan = Double.NaN
    val inf = Double.PositiveInfinity
    val left = mkDf(Seq((nan, inf), (-inf, nan), (nan, nan), (-inf, inf)))
    val right = mkDf(Seq((0d, 1d)))
    val got = indexerPairs(IntervalJoin(
      left, right,
      leftSpec = IntervalSpec.closed("start", "stop"),
      rightSpec = IntervalSpec.closed("start", "stop"),
      leftIdCol = Some("i"), rightIdCol = Some("i"),
      returnIndexers = true))
    assert(got == Seq((3L, 0L))) // only the genuine (-inf, inf) row matches
  }

  test("unbounded sides via absent endpoint columns") {
    val left = Seq((0d, 0L), (5d, 1L), (100d, 2L)).toDF("p", "i")
    val right = mkDf(Seq((1d, 10d)))
    // left points vs right [1,10]; left interval = [p, +inf)
    val got = indexerPairs(IntervalJoin(
      left, right,
      leftSpec = IntervalSpec.unboundedAbove("p"),
      rightSpec = IntervalSpec.closed("start", "stop"),
      leftIdCol = Some("i"), rightIdCol = Some("i"),
      returnIndexers = true))
    // [0,inf) and [5,inf) overlap [1,10]; [100,inf) does not
    assert(got == Seq((0L, 0L), (1L, 0L)))
  }

  test("suffixes and full-row output") {
    val left  = mkDf(Seq((0d, 2d), (7d, 8d)))
    val right = mkDf(Seq((1d, 3d)))
    val out = IntervalJoin(
      left, right,
      leftSpec = IntervalSpec.closed("start", "stop"),
      rightSpec = IntervalSpec.closed("start", "stop"),
      how = "left",
      leftIdCol = Some("i"), rightIdCol = Some("i"))
    assert(out.columns.toSeq ==
      Seq("start_x", "stop_x", "i_x", "start_y", "stop_y", "i_y"))
    assert(out.count() == 2)
  }

  test("invalid arguments raise (test_merge_intervals.py:451-529)") {
    val left  = mkDf(Seq((0d, 2d), (7d, 8d), (1d, 5d), (8d, 9d)))
    val right = mkDf(Seq((10d, 11d), (4d, 5d), (0d, 3d)))
    def join(
        how: String = "inner", keep: String = "all",
        on: Seq[String] = Nil, leftOn: Seq[String] = Nil,
        rightOn: Seq[String] = Nil,
        suffixes: (Option[String], Option[String]) = (Some("_x"), Some("_y")),
        lSpec: IntervalSpec = IntervalSpec.closed("start", "stop"),
        rSpec: IntervalSpec = IntervalSpec.closed("start", "stop")) =
      IntervalJoin(left, right, lSpec, rSpec, on = on,
        leftOn = leftOn, rightOn = rightOn, how = how, keep = keep,
        suffixes = suffixes)
    // how=True / keep="any" analogs
    intercept[IllegalArgumentException] { join(how = "bogus") }
    intercept[IllegalArgumentException] { join(keep = "any") }
    // on is exclusive with left_on/right_on
    intercept[IllegalArgumentException] {
      join(on = Seq("i"), leftOn = Seq("i"))
    }
    // left_on="group" vs right_on=["group","idx"]: unequal key lists
    intercept[IllegalArgumentException] {
      join(leftOn = Seq("i"), rightOn = Seq("i", "start"))
    }
    // nothing to merge on: no keys, no range columns on either side
    intercept[IllegalArgumentException] {
      join(lSpec = IntervalSpec(None, None), rSpec = IntervalSpec(None, None))
    }
    // overlapping output columns need at least one suffix
    intercept[IllegalArgumentException] { join(suffixes = (None, None)) }
    // NOT an error (reference only warns): a degenerate [start, start)
    // left interval with an open start matches nothing
    val out = join(
      lSpec = IntervalSpec(Some("start"), Some("start"), includeStart = false),
      rSpec = IntervalSpec.closed("start", "stop"))
    assert(out.count() == 0)
  }

  test("autoBinWidth matches manual widths and the unbinned plan") {
    // irregular lengths (0 to 45) across a 0..1000 span
    val left = mkDf((0 until 200).map(i =>
      ((i * 5).toDouble, (i * 5 + i % 30).toDouble)))
    val right = mkDf((0 until 150).map(i =>
      ((i * 7 % 1000).toDouble, (i * 7 % 1000 + i % 45).toDouble)))
    def run(bw: Option[Double], auto: Boolean = false) =
      IntervalJoin(left, right,
        leftSpec = IntervalSpec.closed("start", "stop"),
        rightSpec = IntervalSpec.closed("start", "stop"),
        keepOrder = false,
        leftIdCol = Some("i"), rightIdCol = Some("i"),
        returnIndexers = true, binWidth = bw, autoBinWidth = auto)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val unbinned = run(None)
    assert(run(None, auto = true) == unbinned)     // auto == ground truth
    assert(run(Some(5.0)) == unbinned)             // any manual width too
    assert(run(Some(500.0)) == unbinned)
    // the derived width lands near the median length (~15-22), not a
    // degenerate extreme
    val w = BinnedIntervalJoin.autoWidth(left, "start", "stop",
      right, "start", "stop", sampleFraction = 1.0)
    assert(w > 5.0 && w < 60.0, s"autoWidth=$w")
    // point-only data still yields a positive width (span fallback)
    val pts = mkDf((0 until 50).map(i => (i.toDouble, i.toDouble)))
    val wp = BinnedIntervalJoin.autoWidth(pts, "start", "stop",
      pts, "start", "stop", sampleFraction = 1.0)
    assert(wp > 0.0)
    // both knobs at once is a loud error
    intercept[IllegalArgumentException] {
      IntervalJoin(left, right,
        leftSpec = IntervalSpec.closed("start", "stop"),
        rightSpec = IntervalSpec.closed("start", "stop"),
        binWidth = Some(5.0), autoBinWidth = true)
    }
  }
}
