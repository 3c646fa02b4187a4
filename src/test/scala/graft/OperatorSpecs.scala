package graft

import graft.agg.{Factorize, GroupedMode}
import graft.intervals.{CombineIntervals, GroupIntervals}
import graft.joins.FindContainingInterval
import graft.windows.{PrevNextSpec, PrevNextValues}
import org.apache.spark.sql.functions._

/** Specs for the M3 operator batch: find_containing_interval,
  * prev_next_values, group_intervals, combine_intervals, grouped_mode,
  * factorize — golden fixtures from the reference's tests plus hand-computed
  * cases.
  */
class OperatorSpecs extends SparkSuite {
  import spark.implicits._

  // ── find_containing_interval ──────────────────────────────────────────

  test("find_containing_interval ±inf golden (test_find_containing_interval.py:61-80)") {
    val inf = Double.PositiveInfinity
    val intervals = Seq(
      (0L, 5.7, 6.3), (1L, 1.9, 1.8), (1L, -inf, 0.5), (0L, 478.0, inf),
      (0L, -inf, -87.2), (1L, 3.3, 4.0), (0L, -66.1, -56.7),
      (0L, 143.5, 143.6), (1L, 132.4, 157.7))
      .zipWithIndex
      .map { case ((g, a, b), i) => (g, a, b, i.toLong) }
      .toDF("group", "start", "stop", "i")
    val points = Seq(
      (0L, -58746.0), (0L, -0.1), (0L, 6.0), (0L, 143.5), (0L, 143.6),
      (0L, 209.9), (0L, 492064.523), (1L, 0.0), (1L, 0.5), (1L, 1.85),
      (1L, 144.4), (1L, 3079.51))
      .zipWithIndex
      .map { case ((g, p), i) => (g, p, i.toLong) }
      .toDF("group", "point", "pidx")

    val got = FindContainingInterval(
      intervals, points, Seq("point"),
      on = Seq("group"),
      startCol = Some("start"), stopCol = Some("stop"),
      which = "both",
      intervalIdCol = Some("i"))
      .orderBy("pidx")
      .select("point_first", "point_last")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))

    val want = Seq(4L, -1L, 0L, 7L, 7L, -1L, 3L, 2L, 2L, -1L, 8L, -1L)
    assert(got.map(_._1).toSeq == want)
    assert(got.map(_._2).toSeq == want) // intervals are disjoint per group
  }

  // ── prev_next_values ──────────────────────────────────────────────────

  test("prev_next_values: grouped lag/lead with fills and indicators") {
    val df = Seq(
      (1L, 1.0, 10.0), (1L, 2.0, 20.0), (1L, 3.0, 30.0),
      (2L, 1.0, 40.0), (2L, 2.0, 50.0))
      .toDF("g", "t", "v")
    val out = PrevNextValues(
      df, sortBy = Seq("t"), groupBy = Seq("g"),
      columns = Map("v" -> PrevNextSpec(
        prevName = Some("v_prev"), nextName = Some("v_next"),
        prevFill = Some(lit(-1.0)), nextFill = Some(lit(-2.0)))),
      firstIndicatorName = Some("is_first"),
      lastIndicatorName = Some("is_last"))
      .orderBy("g", "t")
      .select("g", "t", "v_prev", "v_next", "is_first", "is_last")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3),
        r.getBoolean(4), r.getBoolean(5)))

    assert(out.toSeq == Seq(
      (1L, 1.0, -1.0, 20.0, true, false),
      (1L, 2.0, 10.0, 30.0, false, false),
      (1L, 3.0, 20.0, -2.0, false, true),
      (2L, 1.0, -1.0, 50.0, true, false),
      (2L, 2.0, 40.0, -2.0, false, true)))
  }

  // ── group_intervals ───────────────────────────────────────────────────

  test("group_intervals: single-linkage clustering with distance") {
    val df = Seq(
      ("a", 0.0, 1.0), ("a", 1.5, 2.0), ("a", 5.0, 6.0), ("b", 0.0, 1.0))
      .toDF("g", "start", "stop")
    val out = GroupIntervals(
      df, "start", Some("stop"), groupBy = Seq("g"),
      distance = lit(1.0), inclusive = true)
      .orderBy("g", "start")
      .select("g", "start", "interval_group")
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))

    // gap [1,1.5] = 0.5 <= 1 connects; [2,5] = 3 > 1 splits; ids global
    assert(out.toSeq == Seq(
      ("a", 0.0, 0L), ("a", 1.5, 0L), ("a", 5.0, 1L), ("b", 0.0, 2L)))
  }

  test("group_intervals: inclusive vs exclusive distance boundary") {
    val df = Seq(("a", 0.0, 1.0), ("a", 2.0, 3.0)).toDF("g", "start", "stop")
    def ids(inclusive: Boolean): Seq[Long] =
      GroupIntervals(df, "start", Some("stop"), Seq("g"), lit(1.0), inclusive)
        .orderBy("start").select("interval_group").collect().map(_.getLong(0)).toSeq
    assert(ids(inclusive = true) == Seq(0L, 0L))  // 2 <= 1+1
    assert(ids(inclusive = false) == Seq(0L, 1L)) // 2 < 2 fails
  }

  test("group_intervals: overlapping intervals pulled in by cummax") {
    // [0,10] spans past [2,3]: [10.5,12] connects via cummax(10)+1, even
    // though its gap to the *preceding* interval [2,3] is 7.5
    val df = Seq(("a", 0.0, 10.0), ("a", 2.0, 3.0), ("a", 10.5, 12.0),
      ("a", 14.0, 15.0)).toDF("g", "start", "stop")
    val out = GroupIntervals(df, "start", Some("stop"), Seq("g"), lit(1.0))
      .orderBy("start").select("interval_group").collect().map(_.getLong(0))
    assert(out.toSeq == Seq(0L, 0L, 0L, 1L)) // 14 > cummax(12)+1
  }

  // ── combine_intervals ─────────────────────────────────────────────────

  private val ci = Seq(
    ("a", 0.0, 2.0), ("a", 1.0, 3.0), ("a", 5.0, 6.0))
    .toDF("g", "start", "stop")

  private def ciRows(nMin: Int, nMax: Option[Int]) =
    CombineIntervals(ci, "start", Some("stop"),
      groupBy = Seq("g"), nMin = nMin, nMax = nMax)
      .orderBy("start")
      .select("g", "start", "stop")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSeq

  test("combine_intervals: union / intersection / gaps / span") {
    assert(ciRows(1, None) == Seq(("a", 0.0, 3.0), ("a", 5.0, 6.0)))
    assert(ciRows(2, None) == Seq(("a", 1.0, 2.0)))
    assert(ciRows(0, Some(0)) == Seq(("a", 3.0, 5.0)))
    assert(ciRows(0, None) == Seq(("a", 0.0, 6.0)))
  }

  test("combine_intervals: attr_cols count equal attributes once") {
    val df = Seq(
      ("a", "p", 0.0, 4.0), ("a", "p", 1.0, 2.0), ("a", "q", 5.0, 6.0))
      .toDF("g", "attr", "start", "stop")
    // without attrs: [1,2] has depth 2
    val without = CombineIntervals(df, "start", Some("stop"),
      groupBy = Seq("g"), nMin = 2)
      .select("start", "stop").collect().map(r => (r.getDouble(0), r.getDouble(1)))
    assert(without.toSeq == Seq((1.0, 2.0)))
    // with attrs: the two p-intervals count once -> no depth-2 region
    val withAttrs = CombineIntervals(df, "start", Some("stop"),
      attrCols = Seq("attr"), groupBy = Seq("g"), nMin = 2)
    assert(withAttrs.count() == 0)
  }

  test("combine_intervals: length_col variant") {
    val df = Seq(("a", 0.0, 2.0), ("a", 1.0, 2.0)).toDF("g", "start", "len")
    val out = CombineIntervals(df, "start", stopCol = None,
      lengthCol = Some("len"), groupBy = Seq("g"), nMin = 1)
      .select("start", "len").collect().map(r => (r.getDouble(0), r.getDouble(1)))
    assert(out.toSeq == Seq((0.0, 3.0))) // [0,2] ∪ [1,3] = [0,3], length 3
  }

  // ── subtract_intervals ────────────────────────────────────────────────

  test("subtract_intervals: gaps, full deletion, touching rights, attrs kept") {
    import graft.intervals.SubtractIntervals
    val left = Seq(
      ("u1", 0.0, 10.0, "sess_a"),   // pieces [0,3) [5,10) after [3,5)
      ("u1", 20.0, 30.0, "sess_b"),  // rights [19,22) [24,26) [26,28) → [22,24) [28,30)
      ("u2", 0.0, 10.0, "sess_c"),   // fully covered → deleted
      ("u3", 0.0, 4.0, "sess_d"),    // no rights for key → untouched
      ("u1", 50.0, 50.0, "sess_e"),  // empty left (half-open) → dropped
      ("u1", 60.0, 70.0, "sess_f")   // right [60,65) trims the head
    ).toDF("uid", "start", "stop", "sess")
    val right = Seq(
      ("u1", 3.0, 5.0), ("u1", 19.0, 22.0), ("u1", 24.0, 26.0),
      ("u1", 26.0, 28.0),               // touches previous → union [24,28)
      ("u2", -1.0, 11.0),
      ("u1", 60.0, 65.0), ("u1", 64.0, 64.0) // empty right subtracts nothing
    ).toDF("uid", "start", "stop")
    val out = SubtractIntervals(left, right, on = Seq("uid"))
      .orderBy("sess", "start")
      .collect().map(r => (r.getAs[String]("sess"),
        r.getDouble(r.fieldIndex("start")), r.getDouble(r.fieldIndex("stop"))))
    assert(out.toSeq == Seq(
      ("sess_a", 0.0, 3.0), ("sess_a", 5.0, 10.0),
      ("sess_b", 22.0, 24.0), ("sess_b", 28.0, 30.0),
      ("sess_d", 0.0, 4.0),
      ("sess_f", 65.0, 70.0)))
    // schema preserved: same columns, same order
    assert(SubtractIntervals(left, right, on = Seq("uid")).columns.toSeq ==
      left.columns.toSeq)
  }

  test("subtract_intervals: keyless, caller id, binned path equivalence") {
    import graft.intervals.SubtractIntervals
    val left = Seq((1L, 0.0, 100.0), (2L, 40.0, 60.0)).toDF("id", "start", "stop")
    val right = Seq(Tuple2(10.0, 20.0), Tuple2(50.0, 55.0)).toDF("start", "stop")
    val plain = SubtractIntervals(left, right, leftIdCol = Some("id"))
      .orderBy("id", "start").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(plain == Seq(
      (1L, 0.0, 10.0), (1L, 20.0, 50.0), (1L, 55.0, 100.0),
      (2L, 40.0, 50.0), (2L, 55.0, 60.0)))
    val binned = SubtractIntervals(left, right, leftIdCol = Some("id"),
      binWidth = Some(7.0))
      .orderBy("id", "start").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(binned == plain)
  }

  test("subtract_intervals: keyed match phase auto-routes through the sweep") {
    import graft.intervals.SubtractIntervals
    val rnd = new scala.util.Random(7)
    val left = (0 until 200).map { i =>
      val s = rnd.nextDouble() * 50
      (i.toLong, i % 5, s, s + rnd.nextDouble() * 10)
    }.toDF("id", "g", "start", "stop")
    val right = (0 until 200).map { i =>
      val s = rnd.nextDouble() * 60
      (i % 5, s, s + rnd.nextDouble() * 4)
    }.toDF("g", "start", "stop")
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val out = SubtractIntervals(left, right, on = Seq("g"),
        leftIdCol = Some("id"))
      val plan = out.queryExecution.executedPlan.toString
      // broadcasting disabled → the inner match phase is the custom exec
      assert(plan.contains("IntervalSweepJoin"), plan)
      assert(out.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  // ── intersect_intervals ───────────────────────────────────────────────

  test("intersect_intervals: clamping, touching rights, no-coverage drop, attrs") {
    import graft.intervals.IntersectIntervals
    val left = Seq(
      ("u1", 0.0, 10.0, "sess_a"),   // rights [3,5) → piece [3,5)
      ("u1", 20.0, 30.0, "sess_b"),  // rights [19,22) [24,26) [26,28) → [20,22) [24,28)
      ("u2", 0.0, 10.0, "sess_c"),   // right covers all → whole row back
      ("u3", 0.0, 4.0, "sess_d"),    // no rights for key → dropped (inner)
      ("u1", 50.0, 50.0, "sess_e"),  // empty left → dropped
      ("u1", 60.0, 70.0, "sess_f")   // right [60,65) keeps the head
    ).toDF("uid", "start", "stop", "sess")
    val right = Seq(
      ("u1", 3.0, 5.0), ("u1", 19.0, 22.0), ("u1", 24.0, 26.0),
      ("u1", 26.0, 28.0),               // touches previous → union [24,28)
      ("u2", -1.0, 11.0),
      ("u1", 60.0, 65.0), ("u1", 64.0, 64.0) // empty right adds nothing
    ).toDF("uid", "start", "stop")
    val out = IntersectIntervals(left, right, on = Seq("uid"))
      .orderBy("sess", "start")
      .collect().map(r => (r.getAs[String]("sess"),
        r.getDouble(r.fieldIndex("start")), r.getDouble(r.fieldIndex("stop"))))
    assert(out.toSeq == Seq(
      ("sess_a", 3.0, 5.0),
      ("sess_b", 20.0, 22.0), ("sess_b", 24.0, 28.0),
      ("sess_c", 0.0, 10.0),
      ("sess_f", 60.0, 65.0)))
    assert(IntersectIntervals(left, right, on = Seq("uid")).columns.toSeq ==
      left.columns.toSeq)
  }

  test("intersect_intervals: intersect ⊎ subtract tiles every left row") {
    import graft.intervals.{IntersectIntervals, SubtractIntervals}
    val rnd = new scala.util.Random(11)
    val left = (0 until 300).map { i =>
      val s = rnd.nextDouble() * 80
      (i.toLong, i % 7, s, s + rnd.nextDouble() * 15)
    }.toDF("id", "g", "start", "stop")
    val right = (0 until 250).map { i =>
      val s = rnd.nextDouble() * 90
      (i % 7, s, s + rnd.nextDouble() * 6)
    }.toDF("g", "start", "stop")
    val pieces = IntersectIntervals(left, right, on = Seq("g"))
      .unionByName(SubtractIntervals(left, right, on = Seq("g"),
        leftIdCol = Some("id")))
    // exact tiling: per left row the pieces are disjoint and their union
    // is [start, stop) — so lengths sum back and bounds are respected
    val sums = pieces.groupBy("id")
      .agg(sum(col("stop") - col("start")).as("len"),
        min("start").as("lo"), max("stop").as("hi"),
        count(lit(1)).as("n"))
      .join(left, Seq("id"))
      .collect()
    assert(sums.length == 300)
    sums.foreach { r =>
      val total = r.getAs[Double]("stop") - r.getAs[Double]("start")
      assert(math.abs(r.getAs[Double]("len") - total) < 1e-9, r.toString)
      assert(r.getAs[Double]("lo") >= r.getAs[Double]("start") - 1e-12)
      assert(r.getAs[Double]("hi") <= r.getAs[Double]("stop") + 1e-12)
    }
  }

  test("intersect_intervals: binned path equivalence") {
    import graft.intervals.IntersectIntervals
    val left = Seq((1L, 0.0, 100.0), (2L, 40.0, 60.0)).toDF("id", "start", "stop")
    val right = Seq(Tuple2(10.0, 20.0), Tuple2(50.0, 55.0)).toDF("start", "stop")
    val plain = IntersectIntervals(left, right)
      .orderBy("id", "start").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(plain == Seq(
      (1L, 10.0, 20.0), (1L, 50.0, 55.0), (2L, 50.0, 55.0)))
    val binned = IntersectIntervals(left, right, binWidth = Some(7.0))
      .orderBy("id", "start").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(binned == plain)
  }

  // ── changelog_intervals ───────────────────────────────────────────────

  test("changelog_intervals: SCD2 build — chaining, ties, horizon, null ts") {
    import graft.intervals.ChangelogIntervals
    val log = Seq(
      (1L, 1L, Some(10.0), "a"),
      (1L, 2L, Some(20.0), "b"),
      (1L, 3L, Some(20.0), "c"),   // tie with event 2 → event 2 zero-length
      (1L, 4L, Some(35.0), "d"),
      (2L, 5L, Some(5.0), "x"),    // key isolation
      (2L, 6L, None, "y")          // null ts dropped
    ).toDF("k", "eid", "ts", "v")
    val out = ChangelogIntervals(log, Seq("k"), "ts", tieBreak = Seq("eid"))
      .orderBy("eid")
      .collect().map(r => (r.getLong(1), r.getDouble(2),
        Option(r.get(4)).map(_.asInstanceOf[Double])))
    assert(out.toSeq == Seq(
      (1L, 10.0, Some(20.0)),
      (2L, 20.0, Some(20.0)),      // zero-length audit row kept
      (3L, 20.0, Some(35.0)),
      (4L, 35.0, None),            // open-ended tail
      (5L, 5.0, None)))
    // dropEmpty removes the zero-length tie rows only
    val dropped = ChangelogIntervals(log, Seq("k"), "ts",
      tieBreak = Seq("eid"), dropEmpty = true)
      .select("eid").collect().map(_.getLong(0)).sorted.toSeq
    assert(dropped == Seq(1L, 3L, 4L, 5L))
    // horizon closes the tails instead of null
    val horizon = ChangelogIntervals(log, Seq("k"), "ts",
      tieBreak = Seq("eid"), horizon = Some(lit(99.0)))
      .filter(col("eid").isin(4L, 5L))
      .select("stop").collect().map(_.getDouble(0)).toSeq
    assert(horizon == Seq(99.0, 99.0))
    // the built intervals feed the interval algebra directly: stop > start
    // everywhere after dropEmpty (half-open validity)
    assert(ChangelogIntervals(log, Seq("k"), "ts", tieBreak = Seq("eid"),
      dropEmpty = true)
      .filter(col("stop").isNotNull && col("stop") <= col("ts"))
      .count() == 0)
  }

  // ── mixture_report ────────────────────────────────────────────────────

  test("mixture_report: rollup levels, shares, null weights, cube margins") {
    import graft.agg.MixtureReport
    val df = Seq(
      ("en", "web", Some(100L)), ("en", "web", Some(300L)),
      ("en", "code", Some(600L)), ("de", "web", None)
    ).toDF("lang", "source", "w")
    val out = MixtureReport(df, Seq("lang", "source"), "w")
      .collect().map(r => (Option(r.getAs[String]("lang")),
        Option(r.getAs[String]("source")), r.getAs[Int]("level"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("weight"),
        r.getAs[Double]("doc_share"))).toSet
    assert(out == Set(
      (Some("en"), Some("web"), 0, 2L, 400L, 0.5),
      (Some("en"), Some("code"), 0, 1L, 600L, 0.25),
      (Some("de"), Some("web"), 0, 1L, 0L, 0.25),     // null weight → 0
      (Some("en"), None, 1, 3L, 1000L, 0.75),          // lang subtotal
      (Some("de"), None, 1, 1L, 0L, 0.25),
      (None, None, 3, 4L, 1000L, 1.0)))                // grand total
    // cube adds the source-only margins (level 2)
    val cube = MixtureReport(df, Seq("lang", "source"), "w", cube = true)
    assert(cube.filter(col("level") === 2).count() == 2) // web, code
    // one Expand node, one scan — subtotals don't re-read the input
    val plan = cube.queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), plan)
  }

  // ── grouped_mode ──────────────────────────────────────────────────────

  test("grouped_mode: counts, ties to smallest value, all-null groups") {
    val df = Seq[(Long, Option[String])](
      (1L, Some("x")), (1L, Some("x")), (1L, Some("y")),
      (2L, Some("b")), (2L, Some("a")),          // tie -> smallest value
      (3L, None), (3L, None))                    // all-null group
      .toDF("g", "v")
    val out = GroupedMode(df, Seq("g"), "v")
      .orderBy("g").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2)))
    assert(out.toSeq == Seq(
      (1L, Some("x"), 2L), (2L, Some("a"), 1L), (3L, None, 0L)))
  }

  test("grouped_mode: dropna=false counts nulls as values") {
    val df = Seq[(Long, Option[String])](
      (1L, None), (1L, None), (1L, Some("x")))
      .toDF("g", "v")
    val out = GroupedMode(df, Seq("g"), "v", dropna = false)
      .collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2)))
    assert(out.toSeq == Seq((1L, None, 2L)))
  }

  // ── factorize ─────────────────────────────────────────────────────────

  test("factorize: sorted dense codes, nulls last, joint two-frame") {
    val df = Seq[(Option[String], Long)](
      (Some("b"), 0L), (Some("a"), 1L), (Some("b"), 2L), (None, 3L))
      .toDF("k", "i")
    val out = Factorize(df, Seq("k"))
      .orderBy("i").select("code").collect().map(_.getLong(0))
    assert(out.toSeq == Seq(1L, 0L, 1L, 2L)) // a=0, b=1, null=2 (last)

    val df2 = Seq[(Option[String], Long)]((Some("c"), 0L), (Some("a"), 1L))
      .toDF("k2", "j")
    val (f1, f2) = Factorize.joint(df, Seq("k"), df2, Seq("k2"))
    val c1 = f1.orderBy("i").select("code").collect().map(_.getLong(0)).toSeq
    val c2 = f2.orderBy("j").select("code").collect().map(_.getLong(0)).toSeq
    assert(c1 == Seq(1L, 0L, 1L, 3L)) // a=0, b=1, c=2, null=3
    assert(c2 == Seq(2L, 0L))
  }

  test("factorize: first-appearance order when sort=false") {
    val df = Seq(("b", 0L), ("a", 1L), ("b", 2L), ("c", 3L)).toDF("k", "i")
    val out = Factorize(df, Seq("k"), sort = false)
      .orderBy("i").select("code").collect().map(_.getLong(0))
    assert(out.toSeq == Seq(0L, 1L, 0L, 2L)) // b first, then a, then c
  }

  test("factorize: return_count form reports the distinct-key count") {
    val df = Seq(("b", 0L), ("a", 1L), ("b", 2L), ("c", 3L)).toDF("k", "i")
    val (coded, n) = Factorize.withCount(df, Seq("k"))
    assert(n == 3L)
    assert(coded.select("code").distinct().count() == 3L)
  }

  test("histogram equalWidth: bin bounds, max folds into last bin, constant group") {
    import graft.agg.Histogram
    val df = (Seq(0.0, 1.0, 2.0, 3.0, 10.0).map(("a", _)) ++
      Seq(7.0, 7.0, 7.0).map(("b", _))).toDF("g", "v")
    val out = Histogram.equalWidth(df, "v", Seq("g"), bins = 5).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    // a: mn=0 mx=10, bin = floor(v/2), v=10 -> last bin 4
    assert(out(("a", 0L)) == ((2L, 0.0, 1.0)))
    assert(out(("a", 1L)) == ((2L, 2.0, 3.0)))
    assert(out(("a", 4L)) == ((1L, 10.0, 10.0)))
    // constant group collapses to bin 0
    assert(out(("b", 0L)) == ((3L, 7.0, 7.0)))
    assert(out.size == 4)
  }

  test("histogram quantileBins: ntile sizes 3,3,2,2 with deterministic ties") {
    import graft.agg.Histogram
    val df = (1 to 10).map(i => ("a", i.toDouble, i.toLong)).toDF("g", "v", "id")
    val out = Histogram.quantileBins(df, "v", "id", Seq("g"), k = 4).collect()
      .map(r => r.getInt(1) -> ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out(1) == ((3L, 1.0, 3.0)) && out(2) == ((3L, 4.0, 6.0)))
    assert(out(3) == ((2L, 7.0, 8.0)) && out(4) == ((2L, 9.0, 10.0)))
  }

  // ── rolling time windows ─────────────────────────────────────────────

  test("rolling: trailing range frame, closed endpoints, equal-ts ties, null values") {
    import graft.windows.Rolling
    val df = Seq(
      ("u", "2024-01-01 00:00:00", Some(1.0)),
      ("u", "2024-01-01 00:30:00", Some(2.0)),
      ("u", "2024-01-01 01:01:00", Some(3.0)),
      ("u", "2024-01-01 01:02:00", Some(4.0)),
      ("u", "2024-01-01 01:02:00", None), // tie on ts, null value
      ("v", "2024-01-01 05:00:00", Some(9.0)))
      .toDF("g", "tss", "v")
      .withColumn("ts", to_timestamp(col("tss")))
    val out = Rolling.timeWindow(df, Seq("g"), "ts", "v",
      window = 3600L * 1000000L, aggs = Seq("count", "sum", "mean"))
      .select("g", "tss", "v", "roll_count", "roll_sum")
      .collect().map(r => (r.getString(0), r.getString(1), Option(r.get(2))) ->
        ((r.getLong(3), r.getDouble(4)))).toMap
    // 00:00 sees itself; 00:30 sees both; 01:01's lower bound 00:01
    // excludes 00:00 (closed endpoints); the 01:02 tie rows share a frame
    assert(out(("u", "2024-01-01 00:00:00", Some(1.0))) == ((1L, 1.0)))
    assert(out(("u", "2024-01-01 00:30:00", Some(2.0))) == ((2L, 3.0)))
    assert(out(("u", "2024-01-01 01:01:00", Some(3.0))) == ((2L, 5.0)))
    assert(out(("u", "2024-01-01 01:02:00", Some(4.0))) == ((3L, 9.0)))
    assert(out(("u", "2024-01-01 01:02:00", None)) == ((3L, 9.0)))
    assert(out(("v", "2024-01-01 05:00:00", Some(9.0))) == ((1L, 9.0)))
  }

  test("rolling rows frame: window size, minPeriods nulls, per-group isolation") {
    import graft.windows.Rolling
    val df = Seq(
      ("u", 1L, Some(1.0)), ("u", 2L, Some(2.0)), ("u", 3L, Some(3.0)),
      ("u", 4L, None), ("u", 5L, Some(5.0)),
      ("v", 1L, Some(10.0))).toDF("g", "ord", "v")
    val out = Rolling.rowWindow(df, Seq("g"), Seq("ord"), "v",
      k = 3, aggs = Seq("count", "sum"), minPeriods = 2)
      .select("g", "ord", "roll_count", "roll_sum").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), Option(r.get(3))))).toMap
    assert(out(("u", 1L)) == ((1L, None)))           // below minPeriods
    assert(out(("u", 2L)) == ((2L, Some(3.0))))
    assert(out(("u", 3L)) == ((3L, Some(6.0))))
    assert(out(("u", 4L)) == ((2L, Some(5.0))))      // null value drops out
    assert(out(("u", 5L)) == ((2L, Some(8.0))))      // frame rows 3,4,5
    assert(out(("v", 1L)) == ((1L, None)))           // group isolation
  }

  // ── winsorize ────────────────────────────────────────────────────────

  test("winsorize: pandas-interpolated bounds, clipping, nulls, singleton group") {
    import graft.agg.Winsorize
    val a = (1 to 10).map(i => ("a", Some(i.toDouble)))
    val df = (a :+ (("a", None: Option[Double])) :+ (("b", Some(42.0))))
      .toDF("g", "v")
    val out = Winsorize(df, "v", Seq("g"), 0.05, 0.95)
      .select("g", "v", "v_w", "w_lo", "w_hi").collect()
      .map(r => (r.getString(0), Option(r.get(1))) ->
        ((Option(r.get(2)), r.getDouble(3), r.getDouble(4)))).toMap
    // n=10: h_lo = 9·0.05 = 0.45 → 1·0.55 + 2·0.45 = 1.45;
    //       h_hi = 9·0.95 = 8.55 → 9·0.45 + 10·0.55 = 9.55
    def close(a: Any, b: Double) = math.abs(a.asInstanceOf[Double] - b) < 1e-12
    val (c1, lo1, hi1) = out(("a", Some(1.0)))
    assert(close(c1.get, 1.45) && close(lo1, 1.45) && close(hi1, 9.55))
    val (c10, _, _) = out(("a", Some(10.0)))
    assert(close(c10.get, 9.55))
    assert(out(("a", Some(5.0)))._1 == Some(5.0))
    assert(out(("a", None))._1.isEmpty)
    assert(out(("b", Some(42.0))) == ((Some(42.0), 42.0, 42.0)))
  }

  test("normalize: zscore/minmax/rank, nulls excluded, ties, constant group") {
    import graft.agg.Normalize
    val df = Seq(
      ("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(3.0)), ("a", Some(4.0)),
      ("a", None),
      ("t", Some(1.0)), ("t", Some(1.0)), ("t", Some(2.0)),
      ("c", Some(7.0)), ("c", Some(7.0))).toDF("g", "v")
    val out = Normalize(df, "v", Seq("g"), Seq("zscore", "minmax", "rank"))
      .collect().map { r =>
        (r.getString(0), Option(r.get(1))) ->
          ((Option(r.get(2)), Option(r.get(3)), Option(r.get(4))))
      }.toMap
    def d(x: Option[Any]) = x.get.asInstanceOf[Double]
    // group a: mean 2.5, std sqrt(5/3); null row normalizes to all-null
    val z1 = (1.0 - 2.5) / math.sqrt(5.0 / 3.0)
    assert(math.abs(d(out(("a", Some(1.0)))._1) - z1) < 1e-12)
    assert(out(("a", Some(1.0)))._2 == Some(0.0) && out(("a", Some(4.0)))._2 == Some(1.0))
    assert(out(("a", Some(2.0)))._3 == Some(1.0 / 3))
    assert(out(("a", None)) == ((None, None, None)))
    // ties share a competition rank: [1,1,2] → pr 0, 0, 1
    assert(out(("t", Some(2.0)))._3 == Some(1.0))
    assert(out(("t", Some(1.0)))._3 == Some(0.0))
    // constant group: zscore/minmax null (zero variance), rank 0
    assert(out(("c", Some(7.0))) == ((None, None, Some(0.0))))
  }

  test("winsorize bounds agree with the built-in percentile aggregate") {
    import graft.agg.Winsorize
    val rnd = new scala.util.Random(11)
    val df = (0 until 400)
      .map(i => (s"g${i % 7}", rnd.nextDouble() * 100)).toDF("g", "v")
    val got = Winsorize(df, "v", Seq("g"), 0.1, 0.9)
      .groupBy("g").agg(first("w_lo").as("lo"), first("w_hi").as("hi"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val want = df.groupBy("g").agg(
      expr("percentile(v, 0.1)").as("lo"), expr("percentile(v, 0.9)").as("hi"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    want.foreach { case (g, (lo, hi)) =>
      assert(math.abs(got(g)._1 - lo) < 1e-9 && math.abs(got(g)._2 - hi) < 1e-9, g)
    }
  }

  test("top-k: per-group rank semantics + WindowGroupLimit / TakeOrdered plans") {
    import graft.agg.TopK
    import spark.implicits._
    val df = Seq(
      ("a", 1L, 10.0), ("a", 2L, 30.0), ("a", 3L, 30.0), ("a", 4L, 5.0),
      ("b", 5L, 1.0), ("b", 6L, 2.0),
      ("c", 7L, 9.0)
    ).toDF("g", "id", "score")

    val top2 = TopK.perGroup(df, Seq("g"),
      Seq(col("score").desc, col("id").asc), k = 2, rankCol = "r")
    val got = top2.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(3))).sorted.toSeq
    // tie at score=30 in group a breaks by id asc: 2 then 3
    assert(got == Seq(("a", 2L, 1), ("a", 3L, 2), ("b", 5L, 2), ("b", 6L, 1),
      ("c", 7L, 1)))

    // the rank-window + filter shape must trigger group-limit pruning
    val plan = top2.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected WindowGroupLimit pruning below the rank sort:\n$plan")

    val g3 = TopK.global(df, Seq(col("score").desc, col("id").asc), 3)
    assert(g3.collect().map(_.getLong(1)).toSeq == Seq(2L, 3L, 1L))
    assert(g3.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"),
      "global top-k must plan as TakeOrderedAndProject, not a global sort")
  }

  test("profile: one-pass column stats; keySkew top-k with shares") {
    import graft.agg.Profile
    import spark.implicits._
    val df = Seq(
      (1L, Some("a"), Some(2.5)),
      (2L, None, Some(1.0)),
      (3L, Some("b"), None),
      (4L, Some("a"), Some(2.5))
    ).toDF("id", "s", "v")

    val prof = Profile.columns(df, Seq("id", "s", "v")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.getString(4)), Option(r.getString(5))))).toMap
    assert(prof("id") == ((4L, 0L, 4L, Some("1"), Some("4"))))
    assert(prof("s")  == ((4L, 1L, 2L, Some("a"), Some("b"))))
    assert(prof("v")  == ((4L, 1L, 2L, Some("1.0"), Some("2.5"))))

    // skew: key 0 dominates; null keys count as a value; ties by key asc
    val skewed = (Seq.fill(60)(Some(0)) ++ Seq.fill(25)(None) ++
      (1 to 15).map(i => Some(i % 3 + 1)))
      .zipWithIndex.map { case (k, i) => (i.toLong, k) }.toDF("row", "k")
    val top = Profile.keySkew(skewed, "k", k = 2).collect()
      .map(r => (Option(r.get(0)), r.getLong(1), r.getDouble(2)))
      .sortBy(-_._2)
    assert(top.length == 2)
    assert(top(0)._1.contains(0) && top(0)._2 == 60L && top(0)._3 == 0.6)
    assert(top(1)._1.isEmpty && top(1)._2 == 25L && top(1)._3 == 0.25)
  }
}
