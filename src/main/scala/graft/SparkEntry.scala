package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.agg.{Factorize, GroupedMode, Histogram, Winsorize}
import graft.core.{IntervalSpec, Tables}
import graft.dedup.{DuplicateClusters, ExactDedup, MinHashDedup, NgramJaccardDedup, SimHashDedup}
import graft.intervals.{CombineIntervals, GroupIntervals}
import graft.joins.{AsOfJoin, BinnedIntervalJoin, FindContainingInterval, IntervalJoin, SaltedJoin}
import graft.multimodal.Media
import graft.resample.{MakeWindows, ResampleEav, ResampleInterval}
import graft.similarity.{CosineTopK, EmbeddingDedup, IvfAnn, LshAnn, SemDedup}
import graft.text.{Bm25, Fingerprint, LangId, QualityFilter, Shingles, TextStats, VocabStats}
import graft.windows.{Impute, PrevNextSpec, PrevNextValues}

/** Declared output schema for the [[graft.resample.ResampleEav.flatMapWindows]]
  * driver query: one row per (window, attribute) with count, min value and
  * last-by-time value.
  */
final case class FlatAttrSummary(attr: String, n: Long, vmin: Double, vlast: Double)

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is registered in [[queries]]
  * bound to the driver's TPC-H-ish parquet testdata, with an equivalent
  * DuckDB oracle in [[oracleSql]] where ANSI-SQL-expressible.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** orders as per-customer activity intervals [orderdate, orderdate+days]. */
  private def orderWindows(s: SparkSession, dir: String, days: Int): DataFrame =
    t(s, dir, "orders").select(
      col("o_orderkey"), col("o_custkey"),
      col("o_orderdate").as("win_start"),
      (col("o_orderdate") + expr(s"INTERVAL $days DAYS")).as("win_stop"))

  // ───────────────────────── queries ─────────────────────────

  private val q_interval_contain: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val orders = orderWindows(s, dir, 30)
      val points = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"))
      IntervalJoin(
        orders, points,
        leftSpec  = IntervalSpec.closed("win_start", "win_stop"),
        rightSpec = IntervalSpec.point("l_shipdate"),
        leftOn = Seq("o_orderkey"), rightOn = Seq("l_orderkey"),
        keepOrder = false)
        .select(
          col("o_orderkey").as("okey"),
          col("l_linenumber").as("lnum"),
          col("l_shipdate").as("ship"))
    }

  private val q_interval_overlap: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val a = orderWindows(s, dir, 30)
      val b = orderWindows(s, dir, 15)
      IntervalJoin(
        a, b,
        leftSpec  = IntervalSpec.closed("win_start", "win_stop"),
        rightSpec = IntervalSpec.closed("win_start", "win_stop"),
        on = Seq("o_custkey"),
        keepOrder = false)
        .select(
          col("o_orderkey_x").as("lkey"),
          col("o_orderkey_y").as("rkey"))
    }

  private val q_interval_keep_first: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val a = orderWindows(s, dir, 30)
      val b = orderWindows(s, dir, 15)
      IntervalJoin(
        a, b,
        leftSpec  = IntervalSpec.closed("win_start", "win_stop"),
        rightSpec = IntervalSpec.closed("win_start", "win_stop"),
        on = Seq("o_custkey"),
        keep = "first",
        leftIdCol = Some("o_orderkey"), rightIdCol = Some("o_orderkey"),
        keepOrder = false)
        .select(
          col("o_orderkey_x").as("lkey"),
          col("o_orderkey_y").as("rkey"))
    }

  /** Keyless interval-overlap join on order-date windows via bin
    * bucketing (plain Spark would pick a broadcast nested loop here).
    */
  private val q_interval_binned: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val a = t(s, dir, "orders").filter(col("o_orderkey") % 97 === 0)
        .select(col("o_orderkey").as("lkey"),
          col("o_orderdate").as("ls"),
          (col("o_orderdate") + expr("INTERVAL 2 DAYS")).as("le"))
      val b = t(s, dir, "orders").filter(col("o_orderkey") % 13 === 0)
        .select(col("o_orderkey").as("rkey"),
          col("o_orderdate").as("rs"),
          (col("o_orderdate") + expr("INTERVAL 3 DAYS")).as("re"))
      BinnedIntervalJoin(a, b, "ls", "le", "rs", "re",
        binWidth = 2 * 86400.0)
        .select(col("lkey"), col("rkey"))
    }

  /** merge_intervals on TIMESTAMP endpoints (reference dtype matrix,
    * tests/test_merge_intervals.py:336-349): per-row-length half-open
    * windows [orderdate, orderdate + (okey%30+1) days) containing
    * lineitem ship timestamps, executed through the binned path
    * (binWidth in seconds) — timestamps bin via unix_micros.
    */
  private val q_interval_ts: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val wins = t(s, dir, "orders").select(
        col("o_orderkey"),
        col("o_orderdate").as("win_start"),
        expr("o_orderdate + make_interval(0, 0, 0, cast(o_orderkey % 30 + 1 as int), 0, 0, 0)")
          .as("win_stop"))
      val points = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"))
      IntervalJoin(
        wins, points,
        leftSpec = IntervalSpec(Some("win_start"), Some("win_stop"),
          includeStart = true, includeStop = false),
        rightSpec = IntervalSpec.point("l_shipdate"),
        leftOn = Seq("o_orderkey"), rightOn = Seq("l_orderkey"),
        keepOrder = false,
        binWidth = Some(7 * 86400.0))
        .select(
          col("o_orderkey").as("okey"),
          col("l_linenumber").as("lnum"),
          col("win_stop").as("wstop"),
          col("l_shipdate").as("ship"))
    }

  /** As-of join: for each purchase, the user's latest click at-or-before
    * it within 1 day (pandas merge_asof semantics).
    */
  private val q_asof: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("eid"), col("user_id"), col("ts").as("p_ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("c_ts"), col("value").as("c_v"))
      AsOfJoin(purchases, clicks, "p_ts", "c_ts",
        on = Seq("user_id"), direction = "backward",
        tolerance = Some(expr("INTERVAL 1 DAY")))
        .select(col("eid"), col("c_ts").as("click_ts"), col("c_v").as("click_v"))
    }

  /** Same as-of workload as q_asof through the merge path (union + one
    * sorted window pass per user — no pair explosion); same oracle. */
  private val q_asof_merge: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("eid"), col("user_id"), col("ts").as("p_ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("c_ts"), col("value").as("c_v"))
      AsOfJoin.merge(purchases, clicks, "p_ts", "c_ts",
        on = Seq("user_id"), direction = "backward",
        tolerance = Some(expr("INTERVAL 1 DAY")))
        .select(col("eid"), col("c_ts").as("click_ts"), col("c_v").as("click_v"))
    }

  private def keepQuery(keepMode: String): (SparkSession, String) => DataFrame =
    (s, dir) => {
      val a = orderWindows(s, dir, 30)
      val b = orderWindows(s, dir, 15)
      IntervalJoin(
        a, b,
        leftSpec  = IntervalSpec.closed("win_start", "win_stop"),
        rightSpec = IntervalSpec.closed("win_start", "win_stop"),
        on = Seq("o_custkey"),
        keep = keepMode,
        leftIdCol = Some("o_orderkey"), rightIdCol = Some("o_orderkey"),
        keepOrder = false)
        .select(
          col("o_orderkey_x").as("lkey"),
          col("o_orderkey_y").as("rkey"))
    }

  /** inner_or_cross_join (misc.py:939-978): no keys ⇒ cross product. */
  private val q_cross_join: (SparkSession, String) => DataFrame =
    (s, dir) =>
      graft.joins.InnerOrCrossJoin(
        t(s, dir, "nation").select(col("n_nationkey"), col("n_regionkey")),
        t(s, dir, "region").select(col("r_regionkey"), col("r_name")),
        on = Nil)
        .select(col("n_nationkey").as("nk"), col("r_regionkey").as("rk"))

  /** Full-outer interval join with the keep_order row contract: unmatched
    * rows from BOTH sides survive with null partner keys.
    */
  private val q_interval_outer: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val a = orderWindows(s, dir, 30).filter(col("o_orderkey") % 3 === 0)
      val b = orderWindows(s, dir, 15).filter(col("o_orderkey") % 3 === 1)
      IntervalJoin(
        a, b,
        leftSpec  = IntervalSpec.closed("win_start", "win_stop"),
        rightSpec = IntervalSpec.closed("win_start", "win_stop"),
        on = Seq("o_custkey"),
        how = "outer",
        keepOrder = true)
        .select(
          col("o_orderkey_x").as("lkey"),
          col("o_orderkey_y").as("rkey"))
    }

  /** `return_indexers` form (`merging.py:106-115`): just the matched
    * (left id, right id) pairs, −1 for the missing side of outer rows.
    */
  private val q_interval_indexers: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val a = orderWindows(s, dir, 30).filter(col("o_orderkey") % 3 === 0)
      val b = orderWindows(s, dir, 15).filter(col("o_orderkey") % 3 === 1)
      IntervalJoin(
        a, b,
        leftSpec  = IntervalSpec.closed("win_start", "win_stop"),
        rightSpec = IntervalSpec.closed("win_start", "win_stop"),
        on = Seq("o_custkey"),
        how = "outer",
        keepOrder = false,
        leftIdCol = Some("o_orderkey"), rightIdCol = Some("o_orderkey"),
        returnIndexers = true)
    }

  /** Open-endpoint containment: points strictly inside (start, stop). */
  private val q_interval_open: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val orders = orderWindows(s, dir, 30)
      val points = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"))
      IntervalJoin(
        orders, points,
        leftSpec  = IntervalSpec(Some("win_start"), Some("win_stop"),
          includeStart = false, includeStop = false),
        rightSpec = IntervalSpec.point("l_shipdate"),
        leftOn = Seq("o_orderkey"), rightOn = Seq("l_orderkey"),
        keepOrder = false)
        .select(
          col("o_orderkey").as("okey"),
          col("l_linenumber").as("lnum"),
          col("l_shipdate").as("ship"))
    }

  /** Forward as-of: for each purchase, the user's earliest click at-or-
    * after it (unbounded tolerance).
    */
  private val q_asof_forward: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("eid"), col("user_id"), col("ts").as("p_ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("c_ts"), col("value").as("c_v"))
      AsOfJoin(purchases, clicks, "p_ts", "c_ts",
        on = Seq("user_id"), direction = "forward")
        .select(col("eid"), col("c_ts").as("click_ts"), col("c_v").as("click_v"))
    }

  private val q_containing: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val intervals = orderWindows(s, dir, 15)
      val points = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      FindContainingInterval(
        intervals, points, Seq("o_orderdate"),
        on = Seq("o_custkey"),
        startCol = Some("win_start"), stopCol = Some("win_stop"),
        intervalIdCol = Some("o_orderkey"))
        .select(
          col("o_orderkey").as("okey"),
          col("o_orderdate_first").as("first_id"),
          col("o_orderdate_last").as("last_id"))
    }

  /** length_col variant: intervals given as (start, duration), first
    * containing interval only.
    */
  private val q_containing_length: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val intervals = t(s, dir, "orders").select(
        col("o_orderkey"), col("o_custkey"),
        col("o_orderdate").as("win_start"))
        .withColumn("win_len", expr("INTERVAL 15 DAYS"))
      val points = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      FindContainingInterval(
        intervals, points, Seq("o_orderdate"),
        on = Seq("o_custkey"),
        startCol = Some("win_start"), lengthCol = Some("win_len"),
        which = "first",
        intervalIdCol = Some("o_orderkey"))
        .select(
          col("o_orderkey").as("okey"),
          col("o_orderdate_first").as("first_id"))
    }

  /** Multiple point columns at once: one (first,last) pair per column
    * (merging.py:533-535, 555-561).
    */
  private val q_containing_multi: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val intervals = orderWindows(s, dir, 15)
      val points = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          (col("o_orderdate") + expr("INTERVAL 7 DAYS")).as("d2"))
      FindContainingInterval(
        intervals, points, Seq("o_orderdate", "d2"),
        on = Seq("o_custkey"),
        startCol = Some("win_start"), stopCol = Some("win_stop"),
        intervalIdCol = Some("o_orderkey"))
        .select(
          col("o_orderkey").as("okey"),
          col("o_orderdate_first").as("f1"), col("o_orderdate_last").as("l1"),
          col("d2_first").as("f2"), col("d2_last").as("l2"))
    }

  private val q_prev_next: (SparkSession, String) => DataFrame =
    (s, dir) =>
      PrevNextValues(
        t(s, dir, "orders"),
        sortBy = Seq("o_orderdate", "o_orderkey"),
        groupBy = Seq("o_custkey"),
        columns = Map("o_totalprice" -> PrevNextSpec(
          prevName = Some("prev_price"), nextName = Some("next_price"))),
        firstIndicatorName = Some("is_first"),
        lastIndicatorName = Some("is_last"))
        .select(
          col("o_orderkey").as("okey"),
          col("prev_price"), col("next_price"),
          col("is_first"), col("is_last"))

  private val q_group_intervals: (SparkSession, String) => DataFrame =
    (s, dir) =>
      GroupIntervals(
        orderWindows(s, dir, 30),
        "win_start", Some("win_stop"),
        groupBy = Seq("o_custkey"),
        distance = expr("INTERVAL 5 DAYS"),
        tieBreakCols = Seq("o_orderkey"))
        .select(col("o_orderkey").as("okey"), col("interval_group").as("grp"))

  private def combineQuery(nMin: Int, nMax: Option[Int]):
      (SparkSession, String) => DataFrame =
    (s, dir) =>
      CombineIntervals(
        orderWindows(s, dir, 30),
        "win_start", Some("win_stop"),
        groupBy = Seq("o_custkey"), nMin = nMin, nMax = nMax)
        .select(
          col("o_custkey").as("ckey"),
          col("win_start").as("start"), col("win_stop").as("stop"))

  private val q_grouped_mode: (SparkSession, String) => DataFrame =
    (s, dir) =>
      GroupedMode(t(s, dir, "lineitem"), Seq("l_orderkey"), "l_returnflag")
        .select(col("l_orderkey").as("okey"), col("mode"), col("count"))

  /** dropna=false: nulls count as a mode candidate (misc.py:909-917). */
  private val q_grouped_mode_nulls: (SparkSession, String) => DataFrame =
    (s, dir) =>
      GroupedMode(
        t(s, dir, "lineitem").select(col("l_orderkey"),
          when(col("l_linenumber") % 3 === 0, lit(null))
            .otherwise(col("l_returnflag")).as("rf")),
        Seq("l_orderkey"), "rf", dropna = false)
        .select(col("l_orderkey").as("okey"), col("mode"), col("count"))

  /** Two-frame joint factorization: orders.o_orderstatus and
    * lineitem.l_linestatus share one sorted code space.
    */
  private val q_factorize_joint: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val (o, l) = Factorize.joint(
        t(s, dir, "orders"), Seq("o_orderstatus"),
        t(s, dir, "lineitem"), Seq("l_linestatus"))
      o.select(lit("o").as("side"), col("o_orderkey").as("id"),
          lit(0).cast("int").as("sub"), col("code"))
        .unionByName(
          l.select(lit("l").as("side"), col("l_orderkey").as("id"),
            col("l_linenumber").as("sub"), col("code")))
    }

  /** attr_cols: equal-priority overlaps count once; emit windows where at
    * least 2 DISTINCT priorities are simultaneously active per customer.
    */
  private val q_combine_attrs: (SparkSession, String) => DataFrame =
    (s, dir) =>
      CombineIntervals(
        t(s, dir, "orders").select(
          col("o_custkey"), col("o_orderpriority"),
          col("o_orderdate").as("win_start"),
          (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("win_stop")),
        "win_start", Some("win_stop"),
        attrCols = Seq("o_orderpriority"),
        groupBy = Seq("o_custkey"), nMin = 2, nMax = None)
        .select(
          col("o_custkey").as("ckey"),
          col("win_start").as("start"), col("win_stop").as("stop"))

  private val q_factorize: (SparkSession, String) => DataFrame =
    (s, dir) =>
      Factorize(t(s, dir, "lineitem"), Seq("l_returnflag", "l_linestatus"))
        .select(
          col("l_orderkey").as("okey"), col("l_linenumber").as("lnum"),
          col("code"))

  /** Factorize across a mixed dtype row (string + timestamp + boolean) —
    * the reference dtype matrix runs factorize over category/str/bool
    * keys (tests/test_factorize.py:77-92).
    */
  private val q_factorize_mixed: (SparkSession, String) => DataFrame =
    (s, dir) =>
      Factorize(
        t(s, dir, "orders")
          .withColumn("big", col("o_totalprice") > 100000.0),
        Seq("o_orderstatus", "o_orderdate", "big"))
        .select(col("o_orderkey").as("okey"), col("code"))

  /** 4 weekly windows per user over Jan 2024, built with [[MakeWindows]]
    * (start + duration form) from the distinct-user frame.
    */
  private def userWeeks(s: SparkSession, dir: String): DataFrame = {
    val anchors = t(s, dir, "events").select(col("user_id")).distinct()
      .select(col("user_id"),
        explode(sequence(lit(0), lit(3))).as("i"))
      .select(col("user_id"),
        (lit("2024-01-01").cast("timestamp") +
          make_dt_interval(col("i") * 7)).as("anchor"))
    MakeWindows(
      entity = Some(col("user_id")),
      start = Some(col("anchor")),
      duration = Some(expr("INTERVAL 7 DAYS")))(anchors)
      .withColumnRenamed("entity", "user_id")
  }

  /** Order-dependent float aggregates (sums/means/std/…) differ from the
    * oracle's in the last ~2 ulps because partial-aggregation order is not
    * the oracle's summation order; the driver hash is exact, so both sides
    * round to 6 decimals (and `+ 0.0` collapses any −0.0). Differences are
    * ~1e-14 abs (measured r1), so a rounding-boundary straddle is ~1e-8
    * per value — negligible.
    */
  private def r6(c: Column): Column = round(c, 6) + lit(0.0)
  /** Midpoint-nudged rounding for aggregates whose exact values LAND ON
    * decimal rounding midpoints (mad: deviations of 2-decimal inputs
    * averaged over small n give 7+-decimal exact rationals ending in …5).
    * There the engines' rounding algorithms legitimately disagree (Spark
    * rounds the shortest decimal repr half-up; DuckDB scales the binary
    * double), and ~1e-14 summation-order noise flips the step. Adding
    * 1e-9 (≫ noise, ≪ the 5e-7 step) shifts the discontinuity onto
    * values no small-denominator rational can hit, so both engines agree
    * on every real input. Oracle SQL applies the same nudge.
    */
  private def r6m(c: Column): Column = round(c + lit(1e-9), 6) + lit(0.0)

  private val q_resample_eav_std: (SparkSession, String) => DataFrame =
    (s, dir) =>
      ResampleEav(
        t(s, dir, "events"), userWeeks(s, dir),
        agg = Map(
          "click"    -> Seq("mean", "sum", "count", "min", "max", "p50"),
          "purchase" -> Seq("sum", "size", "nunique", "std"),
          "error"    -> Seq("count", "mad", "sem")),
        timeCol = "ts", valueCol = "value",
        entityCol = Some("user_id"), attrCol = Some("event_type"),
        wStartCol = Some("win_start"), wStopCol = Some("win_stop"))
        .select(col("user_id").as("uid"), col("win_start").as("ws"),
          r6(col("click_mean")).as("click_mean"),
          r6(col("click_sum")).as("click_sum"), col("click_count"),
          col("click_min"), col("click_max"),
          r6(col("click_p50")).as("click_p50"),
          r6(col("purchase_sum")).as("purchase_sum"),
          col("purchase_size"), col("purchase_nunique"),
          r6(col("purchase_std")).as("purchase_std"),
          col("error_count"),
          r6m(col("error_mad")).as("error_mad"),
          r6(col("error_sem")).as("error_sem"))

  /** One 28-day window per user, built with the anchor+rel MakeWindows
    * form: [anchor−14d, anchor+14d) around 2024-01-15.
    */
  private def userMonth(s: SparkSession, dir: String): DataFrame = {
    val anchors = t(s, dir, "events").select(col("user_id")).distinct()
      .withColumn("mid", lit("2024-01-15").cast("timestamp"))
    MakeWindows(
      entity = Some(col("user_id")),
      anchor = Some(col("mid")),
      startRel = Some(expr("INTERVAL -14 DAYS")),
      stopRel = Some(expr("INTERVAL 14 DAYS")))(anchors)
      .withColumnRenamed("entity", "user_id")
  }

  /** var/skew/p25 over the month window on raw values, plus `prod` on
    * values clamped to [1, 1.01) (`1 + fmod(v,1)/100` — fmod and the
    * scale are IEEE-exact in both engines) so the product's magnitude
    * stays O(1) and 6-decimal rounding absorbs multiplication-order
    * noise. The moment aggregates must use the RAW values: on the clamped
    * near-constant column the central moments catastrophically cancel and
    * engine-formula differences blow past any rounding.
    */
  private val q_resample_eav_more: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val moments = ResampleEav(
        t(s, dir, "events"), userMonth(s, dir),
        agg = Map("view" -> Seq("var", "skew", "p25", "count")),
        timeCol = "ts", valueCol = "value",
        entityCol = Some("user_id"), attrCol = Some("event_type"),
        wStartCol = Some("win_start"), wStopCol = Some("win_stop"))
      val prods = ResampleEav(
        t(s, dir, "events")
          .withColumn("value", lit(1.0) + (col("value") % 1.0) / 100.0),
        userMonth(s, dir),
        agg = Map("view" -> Seq("prod")),
        timeCol = "ts", valueCol = "value",
        entityCol = Some("user_id"), attrCol = Some("event_type"),
        wStartCol = Some("win_start"), wStopCol = Some("win_stop"))
      moments.join(prods.select(col("user_id"), col("view_prod")), Seq("user_id"))
        .select(col("user_id").as("uid"),
          r6(col("view_var")).as("vvar"),
          r6(col("view_skew")).as("vskew"),
          r6(col("view_prod")).as("vprod"),
          r6(col("view_p25")).as("vp25"),
          col("view_count").as("vcnt"))
    }

  /** Half-unbounded windows (stop only): everything before the per-user
    * cutoff; exercises the rank-agg path with no lower bound.
    */
  private val q_resample_eav_unbounded: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val windows = t(s, dir, "events").select(col("user_id")).distinct()
        .withColumn("win_stop", lit("2024-01-15").cast("timestamp"))
      ResampleEav(
        t(s, dir, "events"), windows,
        agg = Map("view" -> Seq("r0", "t0", "count")),
        timeCol = "ts", valueCol = "value",
        entityCol = Some("user_id"), attrCol = Some("event_type"),
        wStartCol = None, wStopCol = Some("win_stop"))
        .select(col("user_id").as("uid"),
          col("view_r0").as("r0"), col("view_t0").as("t0"),
          col("view_count").as("cnt"))
    }

  private val q_resample_eav_rank: (SparkSession, String) => DataFrame =
    (s, dir) =>
      ResampleEav(
        t(s, dir, "events"), userWeeks(s, dir),
        agg = Map("view" -> Seq("r0", "t0", "r-1", "t-1")),
        timeCol = "ts", valueCol = "value",
        entityCol = Some("user_id"), attrCol = Some("event_type"),
        wStartCol = Some("win_start"), wStopCol = Some("win_stop"))
        .select(col("user_id").as("uid"), col("win_start").as("ws"),
          col("view_r0").as("r0"), col("view_t0").as("t0"),
          col("view_r-1").as("rlast"), col("view_t-1").as("tlast"))

  private val q_resample_eav_mode: (SparkSession, String) => DataFrame =
    (s, dir) =>
      ResampleEav(
        t(s, dir, "events"), userWeeks(s, dir),
        agg = Map("signup" -> Seq("mode", "mode_count")),
        timeCol = "ts", valueCol = "value",
        entityCol = Some("user_id"), attrCol = Some("event_type"),
        wStartCol = Some("win_start"), wStopCol = Some("win_stop"))
        .select(col("user_id").as("uid"), col("win_start").as("ws"),
          col("signup_mode").as("mode"), col("signup_mode_count").as("mc"))

  private val q_resample_eav_custom: (SparkSession, String) => DataFrame =
    (s, dir) =>
      ResampleEav(
        t(s, dir, "events"), userWeeks(s, dir),
        agg = Map("purchase" -> Seq("count")),
        timeCol = "ts", valueCol = "value",
        entityCol = Some("user_id"), attrCol = Some("event_type"),
        wStartCol = Some("win_start"), wStopCol = Some("win_stop"),
        customAgg = Map("purchase" -> Seq(
          "tmax" -> graft.resample.CustomAgg.timeOfMax,
          "ssq"  -> ((v, _) => sum(v * v)))))
        .select(col("user_id").as("uid"), col("win_start").as("ws"),
          col("purchase_count").as("cnt"),
          col("purchase_tmax").as("tmax"), r6(col("purchase_ssq")).as("ssq"))

  /** flatMapGroups custom-agg escape hatch (resampling.py:257-273): per
    * window, one emitted row per event type present — a multi-row
    * multi-column custom shape no scalar agg expression can produce.
    */
  private val q_resample_eav_flat: (SparkSession, String) => DataFrame =
    (s, dir) => {
      implicit val enc: org.apache.spark.sql.Encoder[FlatAttrSummary] =
        org.apache.spark.sql.Encoders.product[FlatAttrSummary]
      ResampleEav.flatMapWindows[FlatAttrSummary](
        t(s, dir, "events"), userWeeks(s, dir),
        timeCol = "ts", valueCol = "value",
        entityCol = Some("user_id"), attrCol = Some("event_type"),
        wStartCol = Some("win_start"), wStopCol = Some("win_stop"),
        attributes = Seq("click", "purchase")) { os =>
          os.groupBy(_.attr).toSeq.sortBy(_._1).map { case (a, g) =>
            // g preserves the (t, attr, v) sort → last = latest by time
            FlatAttrSummary(a, g.size.toLong, g.map(_.v).min, g.last.v)
          }
        }
        .select(col("user_id").as("uid"), col("win_start").as("ws"),
          col("attr"), col("n"), col("vmin"), col("vlast"))
    }

  private val q_resample_interval: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val intervals = t(s, dir, "orders").select(
        col("o_custkey"), col("o_orderdate").as("i_start"),
        (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("i_stop"),
        col("o_totalprice").as("v"))
      val windows = t(s, dir, "orders").groupBy(col("o_custkey"))
        .agg(min(col("o_orderdate")).as("win_start"))
        .withColumn("win_stop", col("win_start") + expr("INTERVAL 60 DAYS"))
      ResampleInterval(
        intervals, windows,
        valueCol = "v", entityCol = Some("o_custkey"),
        startCol = Some("i_start"), stopCol = Some("i_stop"),
        attributes = Some(Seq("vsum")),
        wStartCol = Some("win_start"), wStopCol = Some("win_stop"))
        .select(col("o_custkey").as("ckey"), col("win_start").as("ws"),
          r6(col("vsum")).as("vsum"))
    }

  /** Zero-length intervals mixed in (o_orderkey even ⇒ start = stop):
    * fraction is membership ∈ {0,1} for them (resampling.py:556-559).
    */
  private val q_resample_interval_zero: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val intervals = t(s, dir, "orders").select(
        col("o_custkey"), col("o_orderdate").as("i_start"),
        when(col("o_orderkey") % 2 === 0, col("o_orderdate"))
          .otherwise(col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("i_stop"),
        col("o_totalprice").as("v"))
      val windows = t(s, dir, "orders").groupBy(col("o_custkey"))
        .agg(min(col("o_orderdate")).as("win_start"))
        .withColumn("win_stop", col("win_start") + expr("INTERVAL 60 DAYS"))
      ResampleInterval(
        intervals, windows,
        valueCol = "v", entityCol = Some("o_custkey"),
        startCol = Some("i_start"), stopCol = Some("i_stop"),
        attributes = Some(Seq("vsum")),
        wStartCol = Some("win_start"), wStopCol = Some("win_stop"))
        .select(col("o_custkey").as("ckey"), col("win_start").as("ws"),
          r6(col("vsum")).as("vsum"))
    }

  /** Both sides unbounded above (stopCol = None, wStopCol = None): the
    * intersection is infinite, the fraction is 1 and every interval of
    * the entity contributes its full value (resampling.py:563-568).
    */
  private val q_resample_interval_unbounded: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val intervals = t(s, dir, "orders").select(
        col("o_custkey"), col("o_orderdate").as("i_start"),
        col("o_totalprice").as("v"))
      val windows = t(s, dir, "orders").groupBy(col("o_custkey"))
        .agg(min(col("o_orderdate")).as("win_start"))
      ResampleInterval(
        intervals, windows,
        valueCol = "v", entityCol = Some("o_custkey"),
        startCol = Some("i_start"), stopCol = None,
        attributes = Some(Seq("vsum")),
        wStartCol = Some("win_start"), wStopCol = None)
        .select(col("o_custkey").as("ckey"), col("win_start").as("ws"),
          r6(col("vsum")).as("vsum"))
    }

  /** Keyless (global-order) prev/next — exercises the range-partition +
    * boundary-carry path (no data-sized single-partition window).
    */
  private val q_prev_next_global: (SparkSession, String) => DataFrame =
    (s, dir) =>
      PrevNextValues(
        t(s, dir, "orders"),
        sortBy = Seq("o_orderdate", "o_orderkey"),
        groupBy = Nil,
        columns = Map("o_totalprice" -> PrevNextSpec(
          prevName = Some("prev_price"), nextName = Some("next_price"),
          prevFill = Some(lit(-1.0)), nextFill = None)),
        firstIndicatorName = Some("is_first"))
        .select(
          col("o_orderkey").as("okey"),
          col("prev_price"), col("next_price"), col("is_first"))

  /** prev/next with group-edge fill values (misc.py:486-496). */
  private val q_prev_next_fill: (SparkSession, String) => DataFrame =
    (s, dir) =>
      PrevNextValues(
        t(s, dir, "orders"),
        sortBy = Seq("o_orderdate", "o_orderkey"),
        groupBy = Seq("o_custkey"),
        columns = Map("o_totalprice" -> PrevNextSpec(
          prevName = Some("prev_price"), nextName = Some("next_price"),
          prevFill = Some(lit(-1.0)), nextFill = Some(lit(-1.0)))))
        .select(
          col("o_orderkey").as("okey"),
          col("prev_price"), col("next_price"))

  /** events.value with deterministic synthesized nulls (event_id % 5 = 0). */
  private def eventsWithNulls(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events").select(
      col("event_id"), col("user_id"), col("ts"),
      when(col("event_id") % 5 === 0, lit(null)).otherwise(col("value")).as("v"))

  private val q_impute_ffill: (SparkSession, String) => DataFrame =
    (s, dir) =>
      Impute(eventsWithNulls(s, dir), Seq("v"), "ffill",
        groupBy = Seq("user_id"),
        orderBy = Seq(col("ts"), col("event_id")), limit = Some(2))
        .select(col("event_id").as("eid"), col("v").as("v_imp"))

  private val q_impute_linear: (SparkSession, String) => DataFrame =
    (s, dir) =>
      Impute(eventsWithNulls(s, dir), Seq("v"), "linear",
        groupBy = Seq("user_id"),
        orderBy = Seq(col("ts"), col("event_id")))
        .select(col("event_id").as("eid"), col("v").as("v_imp"))

  private val q_impute_afill: (SparkSession, String) => DataFrame =
    (s, dir) =>
      Impute(eventsWithNulls(s, dir), Seq("v"), "afill",
        groupBy = Seq("user_id"),
        orderBy = Seq(col("ts"), col("event_id")))
        .select(col("event_id").as("eid"), col("v").as("v_imp"))

  private val q_impute_bfill: (SparkSession, String) => DataFrame =
    (s, dir) =>
      Impute(eventsWithNulls(s, dir), Seq("v"), "bfill",
        groupBy = Seq("user_id"),
        orderBy = Seq(col("ts"), col("event_id")), limit = Some(2))
        .select(col("event_id").as("eid"), col("v").as("v_imp"))

  /** Keyless (global-order) afill — exercises the two-phase
    * range-partition + carry path (no data-sized single-partition
    * window; see the Impute scale note).
    */
  private val q_impute_global: (SparkSession, String) => DataFrame =
    (s, dir) =>
      Impute(eventsWithNulls(s, dir), Seq("v"), "afill",
        groupBy = Nil,
        orderBy = Seq(col("ts"), col("event_id")), limit = Some(3))
        .select(col("event_id").as("eid"), col("v").as("v_imp"))

  /** lfill = linear interior + ffill/bfill at the group edges. */
  private val q_impute_lfill: (SparkSession, String) => DataFrame =
    (s, dir) =>
      Impute(eventsWithNulls(s, dir), Seq("v"), "lfill",
        groupBy = Seq("user_id"),
        orderBy = Seq(col("ts"), col("event_id")))
        .select(col("event_id").as("eid"), col("v").as("v_imp"))

  // ───────────── training-data pipeline ops (dedup / ANN / text) ────────

  /** documents/embeddings parquet is a single small file → one input
    * partition; the per-row-heavy dedup/text ops need the cores, so
    * spread rows first (at real scale the scan is already partitioned
    * and this repartition is unnecessary).
    */
  private def docs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").repartition(s.sparkContext.defaultParallelism)
  private def emb(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings").select(col("vec_id"), col("label"),
      col("embedding").cast("array<double>").as("embedding"))
      .repartition(s.sparkContext.defaultParallelism)

  private val q_partition_series: (SparkSession, String) => DataFrame =
    (s, dir) =>
      graft.core.PartitionSeries(
        t(s, dir, "lineitem"), Seq("l_orderkey"), budget = 1000L)
        .select(col("l_orderkey").as("g"), col("partition_id").as("pid"))

  /** Equal-width histogram of extended price per return flag. */
  private val q_hist_width: (SparkSession, String) => DataFrame =
    (s, dir) =>
      Histogram.equalWidth(t(s, dir, "lineitem"), "l_extendedprice",
        Seq("l_returnflag"), bins = 8)
        .select(col("l_returnflag").as("g"), col("bin"),
          col("n"), col("lo"), col("hi"))

  /** Quartile bins of order totals per priority (ntile, tie-broken by
    * order key for cross-engine determinism). */
  private val q_hist_quantile: (SparkSession, String) => DataFrame =
    (s, dir) =>
      Histogram.quantileBins(t(s, dir, "orders"), "o_totalprice",
        "o_orderkey", Seq("o_orderpriority"), k = 4)
        .select(col("o_orderpriority").as("g"),
          col("bucket").cast("long").as("bucket"),
          col("n"), col("lo"), col("hi"))

  private val q_dedup_exact: (SparkSession, String) => DataFrame =
    (s, dir) =>
      ExactDedup(docs(s, dir), Seq("text"), "doc_id")
        .select(col("canonical_id").as("cid"), col("dup_count").as("n"))

  /** End-to-end curation pipeline: length filter → exact-dedup survivors
    * → near-dup transitive-closure canonicals → per-(lang, source) corpus
    * stats. Every stage is an oracle-proven operator; the composition is
    * oracle-checked as a whole.
    *
    * The near-dup stage runs the SCALE shape a 100 TB curation pass
    * actually uses: MinHash+LSH candidates with ANCHOR2 pairing (O(m)
    * pairs per bucket instead of m(m−1)/2 — cluster assignment only
    * needs the closure, never the full pair list) and the refused-bucket
    * recall audit attached as an `observe` metric, so every run reports
    * its silent-recall loss for free. Oracle: transitive closure of the
    * EXACT 3-gram-Jaccard pair set over the survivors (complete at 16×2
    * bands whp — same argument as q_dedup_minhash/q_dedup_anchor). */
  private val q_pipeline: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val d1 = docs(s, dir)
        .withColumn("ntok", size(Shingles.tokens(col("text"))).cast("long"))
        .filter(col("ntok") >= 5)
      // the survivors frame feeds BOTH pair generation and cluster
      // assignment — materialize once (at lake scale this is the point
      // where a pipeline writes its intermediate back to storage)
      val d3 = ExactDedup.survivors(d1, Seq("text"), "doc_id")
        .localCheckpoint(false)
      val pairs = MinHashDedup(d3, "text", "doc_id",
        numHashes = 32, numBands = 16, shingleN = 3, threshold = 0.8,
        pairing = "anchor2", observeDropped = Some("graft_pipeline_dedup"))
      DuplicateClusters(d3, "doc_id", pairs, "id_l", "id_r")
        .filter(col("is_canonical") === 1)
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"), sum("ntok").as("n_tokens"))
    }

  /** The FULL curation chain — every stage a 100 TB pipeline runs, in
    * production order, oracle-checked end-to-end (composition is where
    * schema/contract bugs hide; the 3-stage q_pipeline* chains cover
    * pieces of this):
    *
    *   raw ∪ synthesized exact copies (1-in-7 docs re-crawled under a
    *   shifted id — the corpus itself is dup-free)
    *   → 1 Gopher quality gate (all 7 rules, loosened to corpus scale)
    *   → 2 URL blocklist (host + registrable domain, broadcast anti)
    *   → 3 exact dedup (min-id survivor per text)
    *   → 4 anchor2 MinHash+LSH near-dup, transitive-closure canonicals,
    *       refused-bucket recall loss carried as an `observe` metric
    *   → 5 SemDedup over the survivors' embeddings (IVF cells from the
    *       8 smallest surviving vec_ids; embedding key = doc_id mod
    *       100000, so a re-crawled copy that outlives a blocked
    *       original still finds its vector)
    *   → 6 decontamination (4-gram overlap vs the raw eval split —
    *       3-grams over-trigger as the eval gram set grows with scale,
    *       streaming-safe perRow projection, keep frac ≤ 0.05)
    *   → 7 WordPiece tokenize with a BPE vocab trained on the CURATED
    *       corpus itself (train → fold → codegen'd longest match)
    *   → 8 token-budget packing (budget 128, doc-id order, two-phase
    *       PrefixSum offsets)
    *
    * Output: per (lang, source) doc/token/UNK counts plus the number of
    * (doc × pack) overlap rows — every stage's membership and the
    * packing boundaries all feed the hash, so any drift anywhere in the
    * chain fails the oracle. */
  /** q_pipeline5's gate stages 1-6 (everything that DROPS rows; 7-8 are
    * transforms), shared with [[q_funnel_pipeline]]: returns the input
    * corpus `d0` and the ordered (name, surviving frame) list. */
  private def pipeline5Stages(s: SparkSession, dir: String)
      : (DataFrame, Seq[(String, DataFrame)]) = {
    import s.implicits._
    val raw = docs(s, dir)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
    val d0 = raw.unionByName(
      raw.filter(col("doc_id") % 7 === 0)
        .withColumn("doc_id", col("doc_id") + 100000L))
    // every stage frame is (lazily) checkpointed — the Spark analog of
    // the oracle's MATERIALIZED stage CTEs: each stage is referenced
    // 2-3× downstream (the next stage, q_pipeline5's tail, AND
    // q_funnel_pipeline's flag joins), and without the pin each
    // reference re-evaluates the whole chain below it (the MinHash
    // clustering would run twice per funnel query)
    // 1 ── quality gate
    val q1 = QualityFilter.keep(d0, "text",
      QualityFilter.GopherThresholds(
        minTokens = 12, maxTokens = 1000,
        minMeanLen = 2.5, maxMeanLen = 6.0, minStopwords = 1))
      .localCheckpoint(false)
    // 2 ── URL blocklist
    val blocked = Seq("site.co.uk", "cdn.media.org", "news.com")
      .toDF("entry")
    val q2 = graft.text.UrlFilter(
      q1.withColumn("url", synUrl(col("doc_id"))), "url",
      blocked, "entry").drop("url")
      .localCheckpoint(false)
    // 3 ── exact dedup survivors
    val q3 = ExactDedup.survivors(q2, Seq("text"), "doc_id")
      .localCheckpoint(false)
    // 4 ── anchor2 near-dup canonicals (+ observed recall loss)
    val pairs = MinHashDedup(q3, "text", "doc_id",
      numHashes = 32, numBands = 16, shingleN = 3, threshold = 0.8,
      pairing = "anchor2", observeDropped = Some("graft_p5_minhash"))
    val q4 = DuplicateClusters(q3, "doc_id", pairs, "id_l", "id_r")
      .filter(col("is_canonical") === 1)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
      .localCheckpoint(false)
    // 5 ── SemDedup on the survivors' embeddings
    val e5 = emb(s, dir).join(
      q4.select((col("doc_id") % 100000L).as("__p5_k")),
      col("vec_id") === col("__p5_k"), "left_semi")
    val model = IvfAnn.fit(e5, "vec_id", "embedding", nlist = 8)
    val semCanon = SemDedup(e5, "vec_id", "embedding", model,
      threshold = 0.3)
      .filter(col("is_canonical") === 1).select(col("vec_id"))
    val q5 = q4.join(semCanon,
      col("doc_id") % 100000L === col("vec_id"), "left_semi")
      .localCheckpoint(false)
    // 6 ── decontamination gate (eval = raw corpus, doc_id % 50 = 0).
    // 4-grams, not q_contamination's 3-grams: the eval gram set grows
    // with the corpus, and at sf0.1 the 3-gram overlap rate (mean
    // frac 0.17) would flunk ~97% of survivors — the whole chain
    // downstream of this gate would be empty. 4-grams filter at
    // every scale tested (drops 2/490 at sf0.01, 88/4900 at sf0.1)
    // without zeroing the corpus.
    val keys = graft.text.Contamination.evalGramKeys(
      raw.filter(col("doc_id") % 50 === 0), "text", n = 4)
    val q6 = graft.text.Contamination.perRow(
      q5.filter(col("doc_id") % 50 =!= 0), "text", keys, n = 4)
      .filter(col("contamination_frac") <= 0.05)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
      .localCheckpoint(false)
    (d0, Seq("quality" -> q1, "url_blocklist" -> q2, "exact_dedup" -> q3,
      "neardup_cluster" -> q4, "semdedup" -> q5, "decontamination" -> q6))
  }

  private val q_pipeline5: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val (_, stages) = pipeline5Stages(s, dir)
      val q6 = stages.last._2
      // 7 ── tokenizer trained on the curated corpus, applied to it
      val words = q6
        .select(explode(Shingles.tokens(col("text"))).as("word"))
        .groupBy("word").agg(count(lit(1)).as("freq"))
      val (_, vocab) = graft.text.Bpe.fit(words, "word", "freq", k = 3)
      val pieces = graft.text.Bpe.toWordPieceVocab(vocab)
      val q7 = q6
        .select(col("doc_id"), col("lang"), col("source"),
          graft.text.WordPiece.tokens(col("text"), pieces).as("toks"))
        .select(col("doc_id"), col("lang"), col("source"),
          size(col("toks")).cast("long").as("n_tok"),
          size(filter(col("toks"), t => t === "[UNK]"))
            .cast("long").as("n_unk"))
      // 8 ── token-budget packing, then the per-(lang, source) rollup
      val packRows = graft.text.Packing.chunk(
          q7.select(col("doc_id"), col("n_tok")),
          Seq(col("doc_id")), col("n_tok"), budget = 128L)
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_pack_rows"))
      q7.join(packRows, Seq("doc_id"), "left")
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("n_tokens"),
          sum(col("n_unk")).as("n_unk"),
          sum(coalesce(col("n_pack_rows"), lit(0L))).as("n_pack_rows"))
    }

  /** The exact n-gram Jaccard verifier DEMO, scoped to a FIXED-size
    * slice (doc_id < 500 — all of the sf0.01 correctness corpus,
    * constant work at any scale factor): within-block all-pairs
    * verification is quadratic in the block, so the operator's honest
    * role at corpus scale is verifying candidate pairs some bounded
    * generator produced (exactly what [[MinHashDedup]]'s verify stage
    * does via the same hashed-Jaccard kernel) — the registered closure
    * chain (q_dedup_cluster) rides the anchor2 LSH generator instead. */
  private val q_dedup_ngram: (SparkSession, String) => DataFrame =
    (s, dir) =>
      NgramJaccardDedup(docs(s, dir).filter(col("doc_id") < 500),
        "text", "doc_id",
        n = 1, threshold = 0.9, blockBy = Seq("lang"))

  private val q_dedup_minhash: (SparkSession, String) => DataFrame =
    (s, dir) =>
      MinHashDedup(docs(s, dir), "text", "doc_id",
        numHashes = 32, numBands = 16, shingleN = 3, threshold = 0.8)

  /** The MinHash-LSH banding advisor ([[graft.dedup.LshAdvisor]]) — the
    * dedup-side sibling of q_ann_advise: for a 16-hash signature budget
    * it measures every candidate banding's recall against the EXACT
    * 3-gram Jaccard pair set and its candidate-pair bill on a
    * deterministic md5-rank 256-doc sample, then picks the cheapest
    * banding meeting the 0.9 recall floor. Every stage is md5-hashed
    * (engine-portable, unlike the production path's xxhash64), so the
    * DuckDB oracle replays the WHOLE procedure: sampling, shingling,
    * the inverted-index exact pair set, the 16 minhashes, each banding's
    * buckets and distinct candidate pairs, and the choice rule itself
    * (ties broken by hits — same order as recall, same denominator).
    */
  private val q_lsh_advise: (SparkSession, String) => DataFrame =
    (s, dir) => {
      import s.implicits._
      val a = graft.dedup.LshAdvisor.advise(
        docs(s, dir), "text", "doc_id",
        numHashes = 16, shingleN = 3, threshold = 0.8, recallFloor = 0.9,
        bandCandidates = Seq(2, 4, 8, 16), sampleDocs = 256)
      a.table.map(m => (m.numBands, m.rowsPerBand, m.sCurve,
          m.truePairs, m.candidates, m.hits, m.recall,
          if (a.chosen.contains(m)) 1 else 0))
        .toDF("num_bands", "rows_per_band", "s_curve", "true_pairs",
          "candidates", "hits", "recall", "chosen")
        .withColumn("s_curve", r6(col("s_curve")))
    }

  /** Near-dup clustering — the PRODUCTION chain, scale-safe end to end
    * (replaces the block-quadratic NgramJaccardDedup generator, which
    * stays as the bounded exact-verifier demo, q_dedup_ngram):
    *
    *   1. verbatim-copy collapse FIRST (one digest-keyed window pass —
    *      the contract [[MinHashDedup]] documents: boilerplate twins
    *      must never flood LSH buckets); twins connect to their
    *      canonical row by explicit edges,
    *   2. anchor2 MinHash+LSH pairs over the SURVIVORS only (3-gram
    *      shingles, J ≥ 0.8, 2m−3 pairs per bucket — O(m)),
    *   3. one transitive closure over (LSH pairs ∪ twin edges) labels
    *      every document.
    *
    * Oracle: [[AnchorClosureSql]] — the closure of the EXACT 3-gram
    * Jaccard pair set over ALL docs. Twins sit at J = 1 to their
    * canonical row, so collapsing them first and re-attaching by edge
    * provably yields the same components (any exact pair (u,v) maps to
    * its reps with the identical Jaccard), given anchor2-closure ≡
    * exact-closure on the survivors — the property q_dedup_anchor2
    * pins against the same oracle.
    *
    * Why this predicate and not the old unigram J ≥ 0.9: on this
    * corpus the unigram-0.9 similarity graph is DENSE (measured: avg
    * true-pair degree grows ~linearly with the corpus, 9 → 98 from
    * sf0.01 → sf0.1), so ANY generator that materializes that pair
    * set is intrinsically quadratic — the scale fix is the predicate
    * near-dup pipelines actually run (shingled Jaccard, where dup
    * structure is sparse and anchor pairing is sound), not a cleverer
    * enumeration of a dense graph. */
  private val q_dedup_cluster: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val d = docs(s, dir)
      // digest-keyed twin collapse: shuffle rows carry (id, text) only,
      // grouped on (xxhash64, length) so the key stays 12 bytes at lake
      // scale (ExactDedup's hashKey convention)
      val w = Window.partitionBy(xxhash64(col("text")), length(col("text")))
      val withRep = d.select(col("doc_id"), col("text"))
        .withColumn("rep_id", min(col("doc_id")).over(w))
      val twinEdges = withRep.filter(col("doc_id") =!= col("rep_id"))
        .select(col("rep_id").as("id_l"), col("doc_id").as("id_r"))
      val surv = withRep.filter(col("doc_id") === col("rep_id"))
        .select(col("doc_id"), col("text"))
      val lshPairs = MinHashDedup(surv, "text", "doc_id",
        numHashes = 32, numBands = 16, shingleN = 3, threshold = 0.8,
        pairing = "anchor2")
        .select(col("id_l"), col("id_r"))
      DuplicateClusters(d, "doc_id", lshPairs.unionByName(twinEdges),
        "id_l", "id_r")
        .select(col("doc_id").as("did"), col("cluster_id").as("cid"),
          col("cluster_size").as("sz"), col("is_canonical").as("canon"))
    }

  /** Incremental MinHash+LSH: the 10%-of-docs "daily batch" matched
    * against the remaining corpus — batch-vs-corpus candidates only,
    * never corpus-internal pairs. Same LSH parameters as
    * q_dedup_minhash, so the exact bipartite 3-gram-Jaccard oracle is
    * complete whp (16×2 bands miss a J ≥ 0.8 pair with p < 1e-7).
    */
  private val q_dedup_minhash_incr: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val d = docs(s, dir)
      MinHashDedup.incremental(
        d.filter(col("doc_id") % 10 === 0),
        d.filter(col("doc_id") % 10 =!= 0),
        "text", "doc_id",
        numHashes = 32, numBands = 16, shingleN = 3, threshold = 0.8)
    }

  /** 60-bit token hash both Spark and DuckDB compute bit-identically:
    * the first 15 hex digits of md5. Used by the simhash driver query so
    * its DuckDB oracle can reproduce the fingerprints exactly.
    */
  private def md5Hash60(t: Column): Column =
    conv(substring(md5(t.cast("binary")), 1, 15), 16, 10).cast("long")

  private val q_dedup_simhash: (SparkSession, String) => DataFrame =
    (s, dir) =>
      SimHashDedup(docs(s, dir), "text", "doc_id", maxHamming = 3,
        tokenHash = md5Hash60)

  /** The streaming SimHash first-arrival gate executed in batch:
    * [[graft.streaming.StreamingOps.streamingSimHashDedup]] is a
    * stateless codegen'd fingerprint plus a keyed first-row selection,
    * so the identical code path runs bounded here (the MemoryStream
    * spec drives it incrementally). Event time is synthesized
    * monotonically from doc_id, so streaming first-arrival ==
    * min(doc_id) per signature — exactly what the DuckDB oracle
    * computes from the md5-reproducible fingerprints. */
  private val q_dedup_simhash_stream: (SparkSession, String) => DataFrame =
    (s, dir) =>
      graft.streaming.StreamingOps.streamingSimHashDedup(
        docs(s, dir).withColumn("ts", timestamp_seconds(col("doc_id"))),
        "text", "ts", watermark = "1 hour", tokenHash = md5Hash60)
        .select(col("doc_id").as("did"), col("simhash").as("sim"))

  /** The dropped-recall audit as a first-class query:
    * [[graft.dedup.SimHashDedup.droppedBlocks]] reports every pigeonhole
    * block the skew guard would refuse at this `maxBucket` — at corpus
    * scale this runs alongside (or as an `observe` metric inside) the
    * dedup itself so silent recall loss is always a surfaced number.
    * `maxBucket = 1` here so the multi-member blocks that necessarily
    * back every simhash pair are the audited set. */
  private val q_dedup_audit: (SparkSession, String) => DataFrame =
    (s, dir) =>
      SimHashDedup.droppedBlocks(docs(s, dir), "text", "doc_id",
        maxHamming = 3, tokenHash = md5Hash60, maxBucket = 1)

  /** Anchor-paired near-dup clustering — the O(m)-per-bucket scale
    * shape for dup-heavy corpora: LSH buckets emit (member, bucket-min)
    * pairs only, verification runs on those m−1 pairs, and transitive
    * closure recovers the cliques. Oracle: closure of the EXACT 3-gram
    * Jaccard pair set (complete at these LSH params whp, same argument
    * as q_dedup_minhash) — equality proves the anchor pair list loses
    * no cluster structure on a genuinely near-dup corpus. */
  private val q_dedup_anchor: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val d = docs(s, dir)
      val pairs = MinHashDedup(d, "text", "doc_id",
        numHashes = 32, numBands = 16, shingleN = 3, threshold = 0.8,
        pairing = "anchor")
      DuplicateClusters(d, "doc_id", pairs, "id_l", "id_r")
        .select(col("doc_id").as("did"), col("cluster_id").as("cid"),
          col("cluster_size").as("sz"), col("is_canonical").as("canon"))
    }

  /** Two-anchor pairing ("anchor2", 2m−3 pairs per bucket — still
    * O(m)): robust to ONE false-positive anchor per bucket, because the
    * second-smallest member's pairs survive when verification rejects
    * every pair of a collided minimum. Same closure oracle as
    * q_dedup_anchor — on this corpus the anchor, anchor2 and all-pairs
    * closures must coincide. */
  private val q_dedup_anchor2: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val d = docs(s, dir)
      val pairs = MinHashDedup(d, "text", "doc_id",
        numHashes = 32, numBands = 16, shingleN = 3, threshold = 0.8,
        pairing = "anchor2")
      DuplicateClusters(d, "doc_id", pairs, "id_l", "id_r")
        .select(col("doc_id").as("did"), col("cluster_id").as("cid"),
          col("cluster_size").as("sz"), col("is_canonical").as("canon"))
    }

  /** The streaming near-dup gate executed in batch:
    * [[graft.streaming.StreamingOps.streamingMinHashDedup]] is a
    * stream-static equi-join plus stateless in-row banding, so the
    * identical plan runs bounded here under the bipartite exact-Jaccard
    * oracle (the MemoryStream spec drives it incrementally). Same split
    * and LSH params as q_dedup_minhash_incr — the two must agree. */
  private val q_dedup_minhash_stream: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val d = docs(s, dir)
      graft.streaming.StreamingOps.streamingMinHashDedup(
        d.filter(col("doc_id") % 10 === 0)
          .withColumn("ts", lit("2024-01-01 00:00:00").cast("timestamp")),
        d.filter(col("doc_id") % 10 =!= 0),
        "text", "doc_id", "ts", watermark = "1 hour",
        numHashes = 32, numBands = 16, shingleN = 3, threshold = 0.8)
        .select(col("doc_id").as("id_b"), col("id_c"), col("jaccard"))
    }

  /** Streaming semantic gate, batch-executed under the oracle: odd
    * vec_ids arrive as the "stream", even vec_ids are the static lake,
    * IVF cells (8, seed quantizer on the corpus) block the match, exact
    * cosine ≥ 0.3 verifies — same code path as the MemoryStream spec. */
  private val q_dedup_semantic_stream: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val e = emb(s, dir)
      val corpus = e.filter(col("vec_id") % 2 === 0)
      val coarse = IvfAnn.fit(corpus, "vec_id", "embedding", nlist = 8)
      graft.streaming.StreamingOps.streamingSemanticDedup(
        e.filter(col("vec_id") % 2 =!= 0)
          .withColumn("ts", lit("2024-01-01 00:00:00").cast("timestamp")),
        corpus, "embedding", "vec_id", "ts", watermark = "1 hour",
        coarse, nprobe = 2, threshold = 0.3)
        .select(col("vec_id").as("id_s"), col("id_c"),
          r6m(col("cosine")).as("cosine"))
    }

  private val q_dedup_embcos: (SparkSession, String) => DataFrame =
    (s, dir) =>
      EmbeddingDedup(emb(s, dir), "vec_id", "embedding",
        threshold = 0.3, blockBy = Seq("label"))

  /** Per-label embedding centroids (long form; float-sum noise handled
    * by the midpoint-nudged rounding on both engines). */
  private val q_centroid: (SparkSession, String) => DataFrame =
    (s, dir) =>
      graft.similarity.VectorOps.centroidLong(emb(s, dir), "embedding",
        Seq("label"))
        .select(col("label"), col("dim").cast("long").as("dim"),
          r6m(col("mean")).as("mean"))

  /** L2-normalized embeddings, long form (the pre-ANN unit-vector
    * step; dim 1-based). */
  private val q_l2norm: (SparkSession, String) => DataFrame =
    (s, dir) =>
      emb(s, dir)
        .select(col("vec_id"),
          posexplode(graft.similarity.VectorOps.l2normalize(col("embedding"))))
        .select(col("vec_id"), (col("pos") + 1).cast("long").as("dim"),
          r6m(col("col")).as("comp"))

  /** Symmetric int8 quantization codes, long form (dim 1-based). */
  private val q_quantize: (SparkSession, String) => DataFrame =
    (s, dir) =>
      graft.similarity.Quantize.int8(emb(s, dir), "embedding")
        .select(col("vec_id"), col("scale"), posexplode(col("q8")))
        .select(col("vec_id"), (col("pos") + 1).cast("long").as("dim"),
          col("col").cast("int").as("q"), col("scale"))

  private val q_ann_topk: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val e = emb(s, dir)
      // rank is computed on RAW cosines (twin rows tie exactly within an
      // engine, broken by neighbor id); the OUTPUT value gets the r6m
      // nudge because the two engines' cosine formulas associate
      // differently and diverge by 1 ulp on ~1.0 self-twin matches
      // (surfaced by the 10x-replica corpus, where every query gains
      // verbatim twins)
      CosineTopK(e, e.filter(col("vec_id") < 10), "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("neighbor_id"),
          r6m(col("cosine")).as("cosine"), col("rank"))
    }

  /** KMV distinct-count sketch: bounded-state approximate
    * `count_distinct` (distinct orders per return flag). The estimate is
    * deterministic (md5 hashes, no RNG), so the DuckDB oracle reproduces
    * it exactly — the green row witnesses the whole sketch pipeline, not
    * just "rows came back".
    */
  private val q_distinct_sketch: (SparkSession, String) => DataFrame =
    (s, dir) =>
      graft.agg.DistinctSketch.approxDistinct(
        t(s, dir, "lineitem"), Seq("l_returnflag"), "l_orderkey", k = 256)
        .select(col("l_returnflag"),
          r6(col("n_distinct_est")).as("n_distinct_est"))

  /** KMV mergeability under the oracle: the corpus is sketched in two
    * slices (supplier parity) and the sketches UNIONED — the oracle is
    * the single whole-corpus sketch, so the green row proves slice
    * sketches roll up losslessly (the daily→monthly rollup shape).
    */
  private val q_distinct_sketch_merge: (SparkSession, String) => DataFrame =
    (s, dir) => {
      import graft.agg.DistinctSketch._
      val li = t(s, dir, "lineitem")
      val k = 256
      def half(p: Int) =
        sketch(li.filter(col("l_suppkey") % 2 === p),
          Seq("l_returnflag"), "l_orderkey", k)
          .withColumnRenamed("kmv", s"kmv_$p")
      val empty = array().cast("array<long>")
      half(0).join(half(1), Seq("l_returnflag"), "full")
        .select(col("l_returnflag"),
          r6(estimate(unionSketch(coalesce(col("kmv_0"), empty),
            coalesce(col("kmv_1"), empty), k), k)).as("n_distinct_est"))
    }

  /** Bottom-k-by-hash quantile sketch: bounded-state per-group
    * percentiles (the exact `percentile` aggregate buffers every value —
    * the object-hash memory cliff). md5 ranks make the sample — and so
    * every estimate — deterministic; the oracle reproduces it exactly.
    */
  private val q_quantile_sketch: (SparkSession, String) => DataFrame =
    (s, dir) => {
      import graft.agg.QuantileSketch._
      val li = t(s, dir, "lineitem")
        .withColumn("rid", concat_ws("|", col("l_orderkey"),
          col("l_linenumber"), col("l_partkey"), col("l_suppkey")))
      sketch(li, Seq("l_returnflag"), "l_extendedprice", col("rid"), k = 64)
        .select(col("l_returnflag"),
          size(col("qsk")).cast("long").as("n_sample"),
          r6m(quantile(col("qsk"), 0.25)).as("p25"),
          r6m(quantile(col("qsk"), 0.5)).as("p50"),
          r6m(quantile(col("qsk"), 0.75)).as("p75"),
          r6m(quantile(col("qsk"), 0.9)).as("p90"))
    }

  /** Quantile-sketch mergeability under the oracle: two supplier-parity
    * slice sketches unioned; the oracle is the single-pass sketch —
    * the green row proves the bottom-k sample rolls up losslessly.
    */
  private val q_quantile_sketch_merge: (SparkSession, String) => DataFrame =
    (s, dir) => {
      import graft.agg.QuantileSketch._
      val li = t(s, dir, "lineitem")
        .withColumn("rid", concat_ws("|", col("l_orderkey"),
          col("l_linenumber"), col("l_partkey"), col("l_suppkey")))
      val k = 64
      def half(p: Int) =
        sketch(li.filter(col("l_suppkey") % 2 === p),
          Seq("l_returnflag"), "l_extendedprice", col("rid"), k)
          .withColumnRenamed("qsk", s"qsk_$p")
      val empty = array().cast("array<struct<rank:bigint,value:double>>")
      val merged = half(0).join(half(1), Seq("l_returnflag"), "full")
        .select(col("l_returnflag"),
          unionSketch(coalesce(col("qsk_0"), empty),
            coalesce(col("qsk_1"), empty), k).as("qsk"))
      merged.select(col("l_returnflag"),
        size(col("qsk")).cast("long").as("n_sample"),
        r6m(quantile(col("qsk"), 0.25)).as("p25"),
        r6m(quantile(col("qsk"), 0.5)).as("p50"),
        r6m(quantile(col("qsk"), 0.75)).as("p75"),
        r6m(quantile(col("qsk"), 0.9)).as("p90"))
    }

  /** Count-min sketch: token frequencies summarized into a fixed 4×2048
    * grid, then point-estimated for the 20 most frequent tokens next to
    * their exact counts. Deterministic md5 row-hashes → the oracle
    * rebuilds the identical grid and minima in SQL.
    */
  private val q_cms_tokens: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val toks = docs(s, dir)
        .select(explode(graft.text.Shingles.tokens(col("text"))).as("token"))
      val sk = graft.agg.CountMin.sketch(toks, "token", depth = 4, width = 2048)
      val top = toks.groupBy("token").agg(count(lit(1)).as("exact_cnt"))
        .orderBy(col("exact_cnt").desc, col("token")).limit(20)
      graft.agg.CountMin.estimate(sk, top, "token", depth = 4, width = 2048)
        .join(top, Seq("token"))
        .select(col("token"), col("exact_cnt"), col("cms_est"))
    }

  /** Johnson–Lindenstrauss random projection 64 → 8 dims (deterministic
    * ±1 md5 matrix), long form. Sums are order-dependent floats → both
    * sides midpoint-nudge-round (cf. [[r6m]]).
    */
  private val q_rand_proj: (SparkSession, String) => DataFrame =
    (s, dir) =>
      graft.similarity.RandomProjection.project(
        emb(s, dir), "embedding", dimIn = 64, dimOut = 8, seed = 42L)
        .select(col("vec_id"), posexplode(col("embedding")))
        .select(col("vec_id"), (col("pos") + 1).cast("long").as("dim"),
          r6m(col("col")).as("p"))

  /** Embedding-space dedup clustering: cosine near-dup pairs closed
    * transitively — clustering composes with ANY pair generator. */
  private val q_dedup_embcluster: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val e = emb(s, dir)
      val pairs = EmbeddingDedup(e, "vec_id", "embedding",
        threshold = 0.3, blockBy = Seq("label"))
      DuplicateClusters(e.select("vec_id"), "vec_id", pairs, "id_l", "id_r")
        .select(col("vec_id").as("vid"), col("cluster_id").as("cid"),
          col("cluster_size").as("sz"), col("is_canonical").as("canon"))
    }

  /** SemDeDup (Abbas et al. 2023): IVF cells as semantic dedup blocks —
    * deterministic seed centroids (the `nlist` smallest vec_ids, which
    * the DuckDB oracle reproduces as `WHERE vec_id < nlist`), argmax-
    * cosine cell assignment (ties to the smallest cell id on both
    * sides), within-cell pairs ≥ threshold, transitive closure.
    */
  private val q_dedup_semantic: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val e = emb(s, dir)
      val model = IvfAnn.fit(e, "vec_id", "embedding", nlist = 8)
      SemDedup(e, "vec_id", "embedding", model, threshold = 0.3)
        .select(col("vec_id").as("vid"), col("cluster_id").as("cid"),
          col("cluster_size").as("sz"), col("is_canonical").as("canon"))
    }

  /** Quantized brute-force top-k: int8 codes end-to-end. Dot and norms
    * are exact longs (codegen'd VecDotI8/VecSumSqI8) and IEEE sqrt/
    * divide are exactly rounded, so the scores — and hence the ranks —
    * are bit-identical in DuckDB with NO rounding nudge. */
  private val q_ann_q8: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val qz = graft.similarity.Quantize.int8(emb(s, dir), "embedding")
        .select(col("vec_id"), col("q8"))
      graft.similarity.Quantize.topK(
        qz, qz.filter(col("vec_id") < 10), "vec_id", "q8", k = 5)
    }

  /** Shared oracle CTE chain for q_kmeans / q_pipeline4: 3 unrolled
    * integer Lloyd iterations (see graft.similarity.KMeans): quantize
    * floor(x·2^20), argmin exact integer distance (ties → smallest
    * cluster), centroid update = truncating integer division (DuckDB
    * `//` ≡ Scala Long `/`, HUGEINT included — verified -7//2 = -3),
    * empty clusters keep their centroid. Ends with `fr` = per-vector
    * (cluster, dist, rn) where rn=1 is the winning assignment. Zero
    * float tolerance. */
  private val KMeansCte: String = {
    val iters = (1 to 3).map { i =>
      val p = s"c${i - 1}"
      s"""dist$i AS (SELECT p.vec_id, c.cluster,
         |    sum((p.q - c.v) * (p.q - c.v)) AS dist
         |  FROM pts p JOIN $p c ON p.d = c.d GROUP BY 1, 2),
         |a$i AS (SELECT vec_id, cluster,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster) AS rn
         |  FROM dist$i),
         |agg$i AS (SELECT a.cluster, p.d, sum(p.q) AS s, count(*) AS n
         |  FROM pts p JOIN (SELECT vec_id, cluster FROM a$i WHERE rn = 1) a
         |    USING (vec_id)
         |  GROUP BY 1, 2),
         |c$i AS (SELECT c.cluster, c.d, coalesce(g.s // g.n, c.v) AS v
         |  FROM $p c LEFT JOIN agg$i g ON c.cluster = g.cluster AND c.d = g.d)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH pts0 AS (SELECT vec_id,
       |    unnest(range(0, len(embedding))) AS d,
       |    unnest(embedding) AS x
       |  FROM embeddings WHERE embedding IS NOT NULL),
       |pts AS (SELECT vec_id, d,
       |    CAST(floor(x::DOUBLE * 1048576) AS BIGINT) AS q FROM pts0),
       |seeds AS (SELECT vec_id,
       |    row_number() OVER (ORDER BY vec_id) - 1 AS cluster
       |  FROM (SELECT vec_id FROM embeddings WHERE embedding IS NOT NULL
       |        ORDER BY vec_id LIMIT 8)),
       |c0 AS (SELECT s.cluster, p.d, p.q AS v
       |  FROM seeds s JOIN pts p USING (vec_id)),
       |$iters,
       |fd AS (SELECT p.vec_id, c.cluster,
       |    sum((p.q - c.v) * (p.q - c.v)) AS dist
       |  FROM pts p JOIN c3 c ON p.d = c.d GROUP BY 1, 2),
       |fr AS (SELECT vec_id, cluster, dist,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster) AS rn
       |  FROM fd)""".stripMargin
  }

  /** Cluster-balanced subset: Lloyd assignment → exact per-cluster
    * quota via the md5-rank stratified rule — the "diverse subset"
    * curation recipe, oracle-checked as one chain. */
  private val q_pipeline4: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val assigned = graft.similarity.KMeans.fit(emb(s, dir), "vec_id",
        "embedding", k = 8, iters = 3)._2
      graft.sample.Sampling.stratified(
        assigned.select(col("vec_id"), col("cluster")),
        Seq("cluster"), "vec_id", n = 20, seed = 7L)
    }

  /** Deterministic fixed-point Lloyd k-means (k=8, 3 iterations,
    * scale 2^20) over the embedding corpus — assignment AND exact
    * integer distance per vector, bit-identical in any engine (the
    * oracle unrolls the same integer iterations, zero float
    * tolerance — the PageRank determinism contract applied to
    * clustering). */
  private val q_kmeans: (SparkSession, String) => DataFrame =
    (s, dir) =>
      graft.similarity.KMeans.fit(emb(s, dir), "vec_id", "embedding",
        k = 8, iters = 3)._2

  private val q_ann_lsh: (SparkSession, String) => DataFrame =
    (s, dir) =>
      LshAnn.nearDupPairs(emb(s, dir), "vec_id", "embedding",
        numBits = 6, numTables = 8, threshold = 0.3)
        .select(col("id_l"), col("id_r"), r6m(col("cosine")).as("cosine"))

  private val q_ann_ivf: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val e = emb(s, dir)
      IvfAnn(e, e.filter(col("vec_id") < 10), "vec_id", "embedding",
        k = 5, nlist = 16, nprobe = 4)
        .select(col("query_id"), col("neighbor_id"),
          r6m(col("cosine")).as("cosine"), col("rank"))
    }

  /** Query-directed multi-probe LSH top-k (Lv et al., VLDB 2007,
    * [[graft.similarity.LshAnn.search]]): each query probes its own
    * bucket per table PLUS the buckets across its two lowest-margin
    * hyperplanes — recall bought on the query side instead of with
    * more tables (which multiply the persisted index and the
    * corpus-side join rows). The oracle replays the per-plane dots,
    * the margin ordering (abs(dot), bit), the XOR probe set, and the
    * re-rank — the hyperplane recipe is integer-exact by design
    * (LshAnn.hcomp), so signatures and margins agree bit-for-bit.
    */
  private val q_ann_lsh_mp: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val e = emb(s, dir)
      LshAnn.search(e, e.filter(col("vec_id") < 10), "vec_id", "embedding",
        k = 5, numBits = 6, numTables = 2, multiProbe = 2)
        .select(col("query_id"), col("neighbor_id"),
          r6m(col("cosine")).as("cosine"), col("rank"))
    }

  /** SECOND-ORDER multi-probe (the multi-bit prefix of the Lv et al.
    * perturbation sequence): candidate perturbations are all single
    * bits AND all two-bit sets, ranked by total |margin|, so a cheap
    * pair outranks an expensive single — on ONE table at a 6-probe
    * budget. Whether this closes on brute force at fixed budget (or
    * flattens) is measured in SCALING.md; this query pins the probe
    * SEQUENCE itself against DuckDB (the oracle replays the scored
    * set ranking and the multi-bit XOR). Queries here are the BIASED
    * `vec_id < 10` set — fine for a correctness row (deterministic,
    * oracle-replayed); RECALL measurements use the unbiased md5-rank
    * sample (`Mp2Probe`, `q_ann_recall`). */
  private val q_ann_lsh_mp2: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val e = emb(s, dir)
      LshAnn.search(e, e.filter(col("vec_id") < 10), "vec_id", "embedding",
        k = 5, numBits = 6, numTables = 1, multiProbe = 6, probeOrder = 2)
        .select(col("query_id"), col("neighbor_id"),
          r6m(col("cosine")).as("cosine"), col("rank"))
    }

  /** The PERSISTED signature index behind the same multi-probe search:
    * signatures written once as a (tbl, sig)-partitioned layout, the
    * probe set pushed as a literal partition predicate so only probed
    * bucket directories are listed (`PartitionFilters` — spec-pinned in
    * MultiProbeLshSpec). Shares q_ann_lsh_mp's oracle verbatim: the
    * layout must be row-invisible. Same per-application temp path
    * discipline as q_ann_layout. */
  private val q_ann_lsh_layout: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val e = emb(s, dir)
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_lshidx_" +
        s"${s.sparkContext.applicationId}_${Integer.toHexString(dir.hashCode)}"
      LshAnn.writeIndex(e, "vec_id", "embedding", path,
        numBits = 6, numTables = 2)
      LshAnn.searchIndex(s, path, e.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, numBits = 6, numTables = 2,
        multiProbe = 2)
        .select(col("query_id"), col("neighbor_id"),
          r6m(col("cosine")).as("cosine"), col("rank"))
    }

  /** The persisted signature index under SECOND-ORDER multi-probe:
    * q_ann_lsh_mp2's exact search shape (1 table, 6 bits, 6 scored
    * order-2 perturbation sets) over a [[LshAnn.writeIndex]] layout —
    * the probe set here spans 10 queries × up to 7 buckets each, so
    * the literal partition predicate is exercised at a 20+-bucket
    * width (the pruned-listing count is spec-pinned against the probe
    * set in MultiProbeLshSpec). Shares q_ann_lsh_mp2's oracle
    * VERBATIM: the layout must be row-invisible at order 2 too. */
  private val q_ann_lsh_mp2_layout: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val e = emb(s, dir)
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_lshidx_" +
        s"${s.sparkContext.applicationId}_mp2_" +
        Integer.toHexString(dir.hashCode)
      LshAnn.writeIndex(e, "vec_id", "embedding", path,
        numBits = 6, numTables = 1)
      LshAnn.searchIndex(s, path, e.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, numBits = 6, numTables = 1,
        multiProbe = 6, probeOrder = 2)
        .select(col("query_id"), col("neighbor_id"),
          r6m(col("cosine")).as("cosine"), col("rank"))
    }

  /** The LSH signature index's FULL LIFECYCLE in one query — the
    * maintenance story q_ann_layout_append/_compact prove for the IVF
    * cell index, mirrored for the LSH layout: write the index on the
    * base corpus (vec_id % 5 ≠ 0), append the remaining rows in three
    * delta batches (fragmenting the touched (tbl, sig) buckets),
    * compact past the 1-fragment threshold, and multi-probe-search the
    * result. Signatures are deterministic in the vector, so append is
    * bit-identical to a full rebuild — this query therefore shares
    * q_ann_lsh_mp's oracle VERBATIM (the full-corpus replay): append
    * and compact must both be search-invisible, which the spec
    * (MultiProbeLshSpec) pins in-session and this row pins against
    * DuckDB. Queries are the biased `vec_id < 10` correctness set, not
    * the unbiased measurement sample (see q_ann_lsh_mp2's note). */
  private val q_ann_lsh_lifecycle: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val e = emb(s, dir)
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_lshidx_" +
        s"${s.sparkContext.applicationId}_life_" +
        Integer.toHexString(dir.hashCode)
      LshAnn.writeIndex(e.filter(col("vec_id") % 5 =!= 0),
        "vec_id", "embedding", path, numBits = 6, numTables = 2)
      // three delta batches (% 15 ∈ {0,5,10} ⟺ % 5 = 0) fragment the
      // touched buckets so compact has real work
      for (slice <- Seq(0, 5, 10))
        LshAnn.appendIndex(e.filter(col("vec_id") % 15 === slice),
          "vec_id", "embedding", path, numBits = 6, numTables = 2)
      graft.sources.Layout.compact(s, path,
        partitionBy = Seq("tbl", "sig"), sortBy = Seq("neighbor_id"),
        maxFragments = 1)
      LshAnn.searchIndex(s, path, e.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, numBits = 6, numTables = 2,
        multiProbe = 2)
        .select(col("query_id"), col("neighbor_id"),
          r6m(col("cosine")).as("cosine"), col("rank"))
    }

  /** Product-quantization ANN (Jégou et al. 2011): the 64-dim corpus
    * is split into 8 subspaces × 8 codes, codebooks trained by 2
    * integer fixed-point Lloyd iterations, each vector stored as 8
    * codes, and search is ADC — per-query lookup-table sums in exact
    * Longs. Codes, distances, and ranks are bit-identical in DuckDB
    * (the KMeans determinism contract; zero float tolerance). */
  private val q_ann_pq: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val e = emb(s, dir)
      val (model, codes) = graft.similarity.PqAnn.fit(
        e, "vec_id", "embedding", m = 8, ksub = 8, iters = 2)
      graft.similarity.PqAnn.search(
        codes, e.filter(col("vec_id") < 10), "vec_id", "embedding",
        "pq_codes", k = 5, model)
    }

  /** IVF-ADC (Jégou et al. 2011 §IV) — the 100 TB ANN layout proven
    * end-to-end: PQ codes stored beside the coarse IVF cell id, each
    * query probes its 4 nearest of 16 cells and ADC-scores ONLY those
    * candidates, so the scan covers ~nprobe/nlist of the compressed
    * code table (8 B/vector) instead of the raw embeddings. */
  private val q_ann_ivfpq: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val e = emb(s, dir)
      val (model, codes) = graft.similarity.PqAnn.fit(
        e, "vec_id", "embedding", m = 8, ksub = 8, iters = 2)
      val coarse = IvfAnn.fit(e, "vec_id", "embedding", nlist = 16)
      val withCell = codes.join(
        e.filter(col("embedding").isNotNull).select(col("vec_id"),
          coarse.cell(col("embedding").cast("array<double>")).as("cell")),
        "vec_id")
      graft.similarity.PqAnn.search(
        withCell, e.filter(col("vec_id") < 10), "vec_id", "embedding",
        "pq_codes", k = 5, model, coarse = Some(("cell", coarse, 4)))
    }

  /** Residual-encoded IVF-PQ — the classic IVFADC layout
    * (`q_ann_ivfpq` encodes raw vectors with one codebook for the whole
    * corpus; here each vector is encoded as its RESIDUAL against its
    * cell centroid, so the code budget covers the residual ball, and
    * the query builds one lookup table per probed cell). Training,
    * encoding, and per-cell ADC all replay bit-identically in DuckDB;
    * `q_ann_recall` measures what the re-centering buys. */
  private val q_ann_ivfpq_res: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val e = emb(s, dir)
      val coarse = IvfAnn.fit(e, "vec_id", "embedding", nlist = 16)
      val (model, codes) = graft.similarity.PqAnn.fitResidual(
        e, "vec_id", "embedding", coarse, m = 8, ksub = 8, iters = 2)
      graft.similarity.PqAnn.searchResidual(
        codes, e.filter(col("vec_id") < 10), "vec_id", "embedding",
        "pq_codes", "cell", k = 5, model, nprobe = 4)
    }

  /** IVF with a TRAINED coarse quantizer — the production path the
    * seed-centroid `q_ann_ivf` documents ("real deployments train
    * k-means and pass the centroids"): the deterministic fixed-point
    * Lloyd k-means trains 8 cells (3 iterations, exactly replayable),
    * and since cosine is scale-invariant the integer centroids feed the
    * coarse quantizer directly. DuckDB replays the SAME training
    * (KMeansCte) and the same cell/probe/cosine search. */
  private val q_ann_ivf_trained: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val e = emb(s, dir)
      val km = graft.similarity.KMeans.fit(
        e, "vec_id", "embedding", k = 8, iters = 3)._1
      val coarse = IvfAnn.Model(km.centroids.map(_.map(_.toDouble)))
      IvfAnn.search(e, e.filter(col("vec_id") < 10), "vec_id", "embedding",
        k = 5, coarse, nprobe = 2)
        .select(col("query_id"), col("neighbor_id"),
          r6m(col("cosine")).as("cosine"), col("rank"))
    }

  /** Hybrid retrieval with reciprocal-rank fusion (Cormack et al.
    * SIGIR'09): "more-like-this" over the corpus — each seed document
    * ranks every other document twice, lexically (token-set Jaccard:
    * ONE exact int/int division, engine-portable) and semantically
    * (embedding cosine), and the fused score is
    * `10^12 div (60 + rank)` summed over the two legs — an exact
    * integer, so ordering and hashes are engine-identical. The brute
    * legs here are the oracle-checkable baseline; at corpus scale each
    * leg swaps in its blocked variant ([[graft.dedup.MinHashDedup]]
    * banding for Jaccard, [[IvfAnn]]/[[graft.similarity.PqAnn]] for
    * cosine) and the fusion layer — the part this query pins — is
    * unchanged: rank lists in, integer RRF out. */
  private val q_hybrid_rrf: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val toks = docs(s, dir).select(col("doc_id"),
        array_distinct(Shingles.tokens(col("text"))).as("toks"))
      val ev = emb(s, dir).filter(col("embedding").isNotNull)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val corpus = toks.join(ev, toks("doc_id") === ev("vec_id"))
        .select(col("doc_id"), col("toks"), col("v"))
      val seeds = broadcast(corpus.filter(col("doc_id") < 5)
        .select(col("doc_id").as("qid"), col("toks").as("qtoks"),
          col("v").as("qv")))
      val uni = size(array_union(col("toks"), col("qtoks")))
      val pairs = corpus.join(seeds, col("doc_id") =!= col("qid"))
        .select(col("qid"), col("doc_id").as("did"),
          when(uni === 0, lit(0.0)).otherwise(
            size(array_intersect(col("toks"), col("qtoks"))).cast("double") /
              uni).as("jacc"),
          graft.similarity.VectorOps.cosine(col("v"), col("qv")).as("cos"))
      val wl = Window.partitionBy(col("qid")).orderBy(col("jacc").desc, col("did"))
      val ws = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("did"))
      val ranked = pairs
        .withColumn("lrank", row_number().over(wl))
        .withColumn("srank", row_number().over(ws))
      graft.similarity.Rrf.fuse(
        Seq(ranked.select(col("qid"), col("did"), col("lrank").as("r")),
          ranked.select(col("qid"), col("did"), col("srank").as("r"))),
        "qid", "did", "r", topK = 10)
        .select(col("qid").as("query_id"), col("did").as("doc_id"),
          col("rrf_score"), col("rank"))
    }

  /** The ANN index AS a table layout: the PQ code table written
    * hive-partitioned by IVF cell (sorted by id within files), read
    * back, and searched — the probe equi-join on the partition column
    * lets Dynamic Partition Pruning limit the scan to the probed
    * directories, so at lake scale a query batch opens nprobe/nlist of
    * the index files and nothing else. Oracle = q_ann_ivfpq's replay:
    * result equality proves the persisted index is lossless. */
  private val q_ann_layout: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val e = emb(s, dir)
      val (model, codes) = graft.similarity.PqAnn.fit(
        e, "vec_id", "embedding", m = 8, ksub = 8, iters = 2)
      val coarse = IvfAnn.fit(e, "vec_id", "embedding", nlist = 16)
      val withCell = codes.join(
        e.filter(col("embedding").isNotNull).select(col("vec_id"),
          coarse.cell(col("embedding").cast("array<double>")).as("cell")),
        "vec_id")
      // per-APPLICATION path: a fixed dataset-keyed dir raced concurrent
      // runs (one overwrites while the other reads back mid-search) and
      // was one refactor away from silently reusing a stale index from a
      // previous tree; applicationId is unique per SparkContext, so a
      // fresh run can never read another run's files
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_annidx_" +
        s"${s.sparkContext.applicationId}_${Integer.toHexString(dir.hashCode)}"
      graft.sources.Layout.writePartitioned(
        withCell, path, partitionBy = Seq("cell"), sortBy = Seq("vec_id"))
      graft.similarity.PqAnn.search(
        graft.sources.Layout.read(s, path), e.filter(col("vec_id") < 10),
        "vec_id", "embedding", "pq_codes", k = 5, model,
        coarse = Some(("cell", coarse, 4)))
    }

  /** Index MAINTENANCE: the operation a continuously-ingesting pipeline
    * runs daily. PQ codebooks + IVF coarse quantizer are trained on the
    * BASE corpus only (vec_id % 5 ≠ 0); the delta (vec_id % 5 = 0) is
    * encoded with the FROZEN model and APPENDED to the cell-partitioned
    * layout — no rebuild, O(delta) write. The search then runs over the
    * read-back union, and the oracle replays train-on-base +
    * encode-everything + search-over-union: result equality proves the
    * appended index is exactly the index a full rebuild (same fixed
    * model) would produce. PipelineSpecs additionally compares the
    * appended layout against an in-session full rebuild bit-exactly. */
  private val q_ann_layout_append: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val e = emb(s, dir)
      val base = e.filter(col("vec_id") % 5 =!= 0)
      val delta = e.filter(col("vec_id") % 5 === 0)
      val coarse = IvfAnn.fit(base, "vec_id", "embedding", nlist = 16)
      val (model, baseCodes) = graft.similarity.PqAnn.fit(
        base, "vec_id", "embedding", m = 8, ksub = 8, iters = 2)
      def withCell(codes: DataFrame, src: DataFrame) = codes.join(
        src.filter(col("embedding").isNotNull).select(col("vec_id"),
          coarse.cell(col("embedding").cast("array<double>")).as("cell")),
        "vec_id")
      val deltaCodes = delta.filter(col("embedding").isNotNull)
        .select(col("vec_id"), model.encode(col("embedding")).as("pq_codes"))
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_annidx_" +
        s"${s.sparkContext.applicationId}_append_" +
        Integer.toHexString(dir.hashCode)
      // base write is mode=overwrite (static partition-overwrite drops
      // the whole path first), so re-running the query in one session
      // never double-appends the delta
      graft.sources.Layout.writePartitioned(
        withCell(baseCodes, base), path,
        partitionBy = Seq("cell"), sortBy = Seq("vec_id"))
      graft.sources.Layout.appendPartitioned(
        withCell(deltaCodes, delta), path,
        partitionBy = Seq("cell"), sortBy = Seq("vec_id"))
      graft.similarity.PqAnn.search(
        graft.sources.Layout.read(s, path), e.filter(col("vec_id") < 10),
        "vec_id", "embedding", "pq_codes", k = 5, model,
        coarse = Some(("cell", coarse, 4)))
    }

  /** The recall-targeted parameter ADVISOR as a first-class query: for
    * every candidate (nlist, nprobe) the advisor measures recall@5 of
    * IVF search against the exact brute top-5 on the deterministic
    * md5-rank 8-query sample — for the two SEED quantizers AND (new
    * round 12) the integer-Lloyd-TRAINED nlist=8 quantizer, so the
    * decision procedure can pick the production floor its own recall
    * analysis recommends — then picks the cheapest configuration
    * (minimum probed fraction, ties to larger nlist then higher
    * recall, exact cross-family ties to the trained quantizer) meeting
    * the 0.6 floor — `q_ann_recall`'s measurement turned into a
    * decision procedure, oracle-replayed end to end (sampling, all
    * three quantizers incl. the Lloyd training, every search, the
    * exact baseline, the integer intersections, and the choice
    * itself). */
  private val q_ann_advise: (SparkSession, String) => DataFrame =
    (s, dir) => {
      import s.implicits._
      val a = graft.similarity.AnnAdvisor.advise(
        emb(s, dir), "vec_id", "embedding", k = 5, recallFloor = 0.6,
        nlists = Seq(8, 16), nprobes = Seq(1, 2, 4), sampleQueries = 8,
        trainedNlists = Seq(8),
        // the shipped q_ann_lsh_mp shape, priced in the same
        // probed-fraction unit (nlist = 2^6 buckets, nprobe = 2·3
        // probed buckets) so the choice rule ranks hash-probe against
        // both cell-probe families
        lshConfigs = Seq((6, 2, 2)))
      a.table.map(m => (m.quantizer, m.nlist, m.nprobe, m.recall,
          if (a.chosen.contains(m)) 1 else 0))
        .toDF("quantizer", "nlist", "nprobe", "recall", "chosen")
    }

  /** Index COMPACTION — the maintenance step after [[q_ann_layout_append]]'s
    * daily appends: three delta batches (vec_id % 15 ∈ {0, 5, 10}) are
    * frozen-model-encoded and appended to the base layout, leaving up
    * to four files per touched cell; [[graft.sources.Layout.compact]]
    * then rewrites exactly the cells past the fragment threshold (one
    * driver listing bounded by nlist directories, dynamic partition
    * overwrite — untouched cells keep their files) and the probed
    * search over the compacted index must still equal the full replay.
    * Shares q_ann_layout_append's oracle SHAPE (train on base, encode
    * everything, search the union): compaction must be invisible
    * row-for-row. */
  private val q_ann_layout_compact: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val e = emb(s, dir)
      val base = e.filter(col("vec_id") % 5 =!= 0)
      val coarse = IvfAnn.fit(base, "vec_id", "embedding", nlist = 16)
      val (model, baseCodes) = graft.similarity.PqAnn.fit(
        base, "vec_id", "embedding", m = 8, ksub = 8, iters = 2)
      def withCell(codes: DataFrame, src: DataFrame) = codes.join(
        src.filter(col("embedding").isNotNull).select(col("vec_id"),
          coarse.cell(col("embedding").cast("array<double>")).as("cell")),
        "vec_id")
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_annidx_" +
        s"${s.sparkContext.applicationId}_compact_" +
        Integer.toHexString(dir.hashCode)
      graft.sources.Layout.writePartitioned(
        withCell(baseCodes, base), path,
        partitionBy = Seq("cell"), sortBy = Seq("vec_id"))
      for (slice <- Seq(0, 5, 10)) {
        val delta = e.filter(col("vec_id") % 15 === slice &&
          col("embedding").isNotNull)
        val deltaCodes = delta
          .select(col("vec_id"), model.encode(col("embedding")).as("pq_codes"))
        graft.sources.Layout.appendPartitioned(
          withCell(deltaCodes, delta), path,
          partitionBy = Seq("cell"), sortBy = Seq("vec_id"))
      }
      graft.sources.Layout.compact(s, path,
        partitionBy = Seq("cell"), sortBy = Seq("vec_id"), maxFragments = 1)
      graft.similarity.PqAnn.search(
        graft.sources.Layout.read(s, path), e.filter(col("vec_id") < 10),
        "vec_id", "embedding", "pq_codes", k = 5, model,
        coarse = Some(("cell", coarse, 4)))
    }

  /** Recall@10 of every approximate retrieval method against the exact
    * brute-force top-10 — the answer-QUALITY metric the per-method
    * oracle replays cannot see (each `q_ann_*` oracle replays its own
    * algorithm bit-exactly: correctness of the computation, never
    * goodness of the approximation). The same move `q_dedup_audit`
    * made for LSH recall loss: the silent quality dimension becomes a
    * surfaced, oracle-checked number. Methods: IVF at nprobe 1/2/4
    * (the recall-vs-probe-cost curve), brute ADC over PQ codes (the
    * compression loss alone), and IVF-PQ (both losses composed). All
    * counts are exact integers; the one division is exactly rounded —
    * bit-identical in DuckDB, which replays every method AND the
    * brute baseline, then intersects. Mirrors the reference's
    * slow-oracle differential method
    * (`/root/reference/tests/util.py:272-293`) applied to approximate
    * retrieval.
    *
    * Query sample: the UNBIASED md5-rank bottom-10 ids
    * ([[graft.sample.Sampling.md5RankPinned]] — the advisors' sample).
    * The previous `vec_id < 10` sample coincides with [[IvfAnn.fit]]'s
    * seed centroids (cells 0..15 ARE vectors 0..15), so those queries
    * sit at cell centers and flatter IVF recall — `q_ann_advise`
    * measured 0.83–0.99 biased vs 0.18–0.68 unbiased at sf0.1. One
    * biased row (`ivf_n1_biased`) is kept as the documented contrast;
    * every other row is an expectation, not an upper bound.
    */
  private val q_ann_recall: (SparkSession, String) => DataFrame =
    (s, dir) => {
      // pinned EAGERLY: this harness re-references the corpus from ~20
      // separate jobs (four quantizer fits with their collect
      // iterations, two ground truths, and the 12-leg union's corpus
      // scans) — one materialization replaces that many re-runs of the
      // scan/repartition/cast chain. Measurement harness over a bounded
      // corpus by contract (the production advisor samples), so the pin
      // is sample-sized; the bench unpersists all RDD blocks after each
      // timed pass.
      val e = emb(s, dir).localCheckpoint(true)
      val q = graft.sample.Sampling.md5RankPinned(
        e.filter(col("embedding").isNotNull), "vec_id", 10)
      // the ground truth is computed ONCE (localCheckpoint: ≤ 10·k rows)
      val exact = CosineTopK(e, q, "vec_id", "embedding", k = 10)
        .select(col("query_id"), col("neighbor_id"))
        .localCheckpoint(true)
      val coarse = IvfAnn.fit(e, "vec_id", "embedding", nlist = 16)
      val (pqModel, pqCodes) = graft.similarity.PqAnn.fit(
        e, "vec_id", "embedding", m = 8, ksub = 8, iters = 2)
      val withCell = pqCodes.join(
        e.filter(col("embedding").isNotNull).select(col("vec_id"),
          coarse.cell(col("embedding").cast("array<double>")).as("cell")),
        "vec_id")
      def recallRowOn(truth: DataFrame)(name: String,
          approx: DataFrame): DataFrame =
        approx.select(col("query_id"), col("neighbor_id"))
          .join(truth, Seq("query_id", "neighbor_id"))
          .agg(count(lit(1)).as("hits"))
          .crossJoin(truth.agg(count(lit(1)).as("possible")))
          .select(lit(name).as("method"), col("hits"), col("possible"),
            (col("hits").cast("double") / col("possible")).as("recall"))
      def recallRow(name: String, approx: DataFrame): DataFrame =
        recallRowOn(exact)(name, approx)
      // the three ivf legs share the coarse model and differ only in
      // nprobe: one searchMulti pass (prefix-stable probes — see
      // IvfAnn.searchMulti) replaces three corpus cell-assignment
      // passes; the ≤ 3·10·k-row result is pinned so the per-leg
      // filters below don't re-run the shared subtree
      val ivfMulti = IvfAnn.searchMulti(e, q, "vec_id", "embedding",
        k = 10, coarse, nprobes = Seq(1, 2, 4)).localCheckpoint(false)
      val ivfs = Seq(1, 2, 4).map(np => recallRow(s"ivf_n$np",
        ivfMulti.filter(col("nprobe") === np)))
      val pq = recallRow("pq", graft.similarity.PqAnn.search(
        pqCodes, q, "vec_id", "embedding", "pq_codes", k = 10, pqModel))
      val ivfpq = recallRow("ivfpq", graft.similarity.PqAnn.search(
        withCell, q, "vec_id", "embedding", "pq_codes", k = 10, pqModel,
        coarse = Some(("cell", coarse, 4))))
      val (resModel, resCodes) = graft.similarity.PqAnn.fitResidual(
        e, "vec_id", "embedding", coarse, m = 8, ksub = 8, iters = 2)
      val ivfpqRes = recallRow("ivfpq_res",
        graft.similarity.PqAnn.searchResidual(resCodes, q, "vec_id",
          "embedding", "pq_codes", "cell", k = 10, resModel, nprobe = 4))
      // residual encoding with a TRAINED coarse quantizer (the real
      // IVFADC layout): with untrained seed cells the residuals carry
      // MORE variance than the raw unit vectors (measured mean residual
      // norm 1.24 at sf0.1 — cosine-assigned arbitrary corpus vectors
      // are not Euclidean cell means), so residual coding HURTS there;
      // k-means cells shrink the residuals and the same bit budget
      // quantizes less signal. nprobe 2 of 8 cells = the same probed
      // fraction as the nlist=16/nprobe=4 legs. Integer-Lloyd centroids
      // are 2^20-scaled; dividing by scale reproduces them exactly in
      // fitResidual's floor(c·2^20) quantization (dyadic, no rounding).
      val km = graft.similarity.KMeans.fit(
        e, "vec_id", "embedding", k = 8, iters = 3)._1
      val kmCoarse = IvfAnn.Model(
        km.centroids.map(_.map(_.toDouble / km.scale)))
      val (resKm, resKmCodes) = graft.similarity.PqAnn.fitResidual(
        e, "vec_id", "embedding", kmCoarse, m = 8, ksub = 8, iters = 2)
      val ivfpqResKm = recallRow("ivfpq_res_km",
        graft.similarity.PqAnn.searchResidual(resKmCodes, q, "vec_id",
          "embedding", "pq_codes", "cell", k = 10, resKm, nprobe = 2))
      // query-directed multi-probe LSH beside the cell/code families —
      // recall bought on the query side (the q_ann_lsh_mp machinery)
      val lshMp = recallRow("lsh_mp", LshAnn.search(e, q, "vec_id",
        "embedding", k = 10, numBits = 6, numTables = 2, multiProbe = 2))
      // the documented CONTRAST row: the old vec_id < 10 sample, which
      // coincides with the nlist=16 seed centroids — kept so the bias
      // q_ann_advise discovered stays measured next to the unbiased rows
      val qb = e.filter(col("vec_id") < 10)
      val exactB = CosineTopK(e, qb, "vec_id", "embedding", k = 10)
        .select(col("query_id"), col("neighbor_id"))
        .localCheckpoint(true)
      val ivfBiased = recallRowOn(exactB)("ivf_n1_biased",
        IvfAnn.search(e, qb, "vec_id", "embedding", k = 10, coarse,
          nprobe = 1))
      (ivfs :+ pq :+ ivfpq :+ ivfpqRes :+ ivfpqResKm :+ lshMp :+ ivfBiased)
        .reduce(_ unionByName _)
    }

  /** PQ at PRODUCTION bit-width: m = 8 subquantizers × ksub = 256
    * codes = 64-bit codes, the compression real deployments run (the
    * other PQ queries stay at the ksub = 8 / 24-bit demo budget so
    * their composed oracles stay small). Trains 2 integer Lloyd
    * iterations, brute-ADC-searches top-10 for the standard 10 queries
    * through the SAME native table-carrying expressions — whose
    * carried tables are now 256-entry LUTs per subquantizer
    * (`graft.AnnProbe pq256` pins that the consuming stage stays
    * JIT-compiled; numbers in SCALING.md) — and emits the recall@10
    * row against the exact brute cosine top-10. Until this query, the
    * sentence "production would use ksub = 256" was unmeasured
    * folklore by the repo's own standard; the oracle replays training,
    * encoding, ADC ranking, the exact baseline, and the integer
    * intersection bit-for-bit. */
  private val q_ann_pq256: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val e = emb(s, dir)
      val q = e.filter(col("vec_id") < 10)
      val exact = CosineTopK(e, q, "vec_id", "embedding", k = 10)
        .select(col("query_id"), col("neighbor_id"))
        .localCheckpoint(true) // ≤ 10·k rows, reused by hits + possible
      val (model, codes) = graft.similarity.PqAnn.fit(
        e, "vec_id", "embedding", m = 8, ksub = 256, iters = 2)
      val approx = graft.similarity.PqAnn.search(
        codes, q, "vec_id", "embedding", "pq_codes", k = 10, model)
      approx.select(col("query_id"), col("neighbor_id"))
        .join(exact, Seq("query_id", "neighbor_id"))
        .agg(count(lit(1)).as("hits"))
        .crossJoin(exact.agg(count(lit(1)).as("possible")))
        .select(lit("pq256").as("method"), col("hits"), col("possible"),
          (col("hits").cast("double") / col("possible")).as("recall"))
    }

  /** The SCALE path of hybrid retrieval, oracle-checked end-to-end:
    * the lexical leg is MinHash-banded (candidates share a band bucket,
    * exact hashed-shingle Jaccard ≥ 0.8 verifies and ranks) and the
    * semantic leg is IVF cell-probed (top-20 cosine among probed
    * cells) — the two blocked retrievers [[q_hybrid_rrf]]'s brute legs
    * document as their production replacements — fused by the same
    * integer RRF. The oracle replays the exact-Jaccard pair set (LSH
    * completeness at J ≥ 0.8: miss prob < 1e-7), the IVF cell/probe
    * assignment, and the integer fusion. */
  private val q_hybrid_rrf_blocked: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val d = docs(s, dir)
      val e = emb(s, dir)
      val lex = graft.dedup.MinHashDedup.incremental(
        d.filter(col("doc_id") < 5), d.filter(col("doc_id") >= 5),
        "text", "doc_id", numHashes = 32, numBands = 16, shingleN = 3,
        threshold = 0.8)
        .withColumn("r", row_number().over(Window.partitionBy(col("id_b"))
          .orderBy(col("jaccard").desc, col("id_c"))))
        .select(col("id_b").as("qid"), col("id_c").as("did"), col("r"))
      val corpus = e.filter(col("vec_id") >= 5)
      val coarse = IvfAnn.fit(corpus, "vec_id", "embedding", nlist = 16)
      val sem = IvfAnn.search(corpus, e.filter(col("vec_id") < 5),
        "vec_id", "embedding", k = 20, coarse, nprobe = 4)
        .select(col("query_id").as("qid"), col("neighbor_id").as("did"),
          col("rank").as("r"))
      graft.similarity.Rrf.fuse(Seq(lex, sem), "qid", "did", "r", topK = 10)
        .select(col("qid").as("query_id"), col("did").as("doc_id"),
          col("rrf_score"), col("rank"))
    }

  /** Unrolled DuckDB replay of PqAnn's integer Lloyd training + ADC
    * search (m=8 → dsub=8, ksub=8, 2 iterations, scale 2^20). `fdist`
    * doubles as both the final corpus assignment input AND the query
    * lookup tables (queries ⊆ corpus), so ADC = sum over subspaces of
    * the query's distance row at the neighbor's code.
    *
    * `trainPred` restricts TRAINING (seeds + Lloyd updates) to a
    * subset of the corpus while `fdist`/`fcodes` still encode EVERY
    * vector with the final codebooks — the fixed-model shape
    * q_ann_layout_append replays (train on the base, encode the
    * appended delta with the frozen model). "TRUE" = the plain PqCte.
    */
  private def pqCteOn(trainPred: String, ksub: Int = 8,
      px: String = ""): String = {
    val iters = (1 to 2).map { i =>
      val p = s"${px}cb${i - 1}"
      s"""${px}pdist$i AS (SELECT p.vec_id, c.s, c.code,
         |    sum((p.q - c.v) * (p.q - c.v)) AS dist
         |  FROM ${px}pqtrain p JOIN $p c ON p.s = c.s AND p.w = c.w
         |  GROUP BY 1, 2, 3),
         |${px}pa$i AS (SELECT vec_id, s, code,
         |    row_number() OVER (PARTITION BY vec_id, s ORDER BY dist, code) AS rn
         |  FROM ${px}pdist$i),
         |${px}pagg$i AS (SELECT a.s, a.code, p.w, sum(p.q) AS sm, count(*) AS n
         |  FROM ${px}pqtrain p
         |  JOIN (SELECT vec_id, s, code FROM ${px}pa$i WHERE rn = 1) a
         |    ON p.vec_id = a.vec_id AND p.s = a.s
         |  GROUP BY 1, 2, 3),
         |${px}cb$i AS (SELECT c.s, c.code, c.w, coalesce(g.sm // g.n, c.v) AS v
         |  FROM $p c LEFT JOIN ${px}pagg$i g
         |    ON c.s = g.s AND c.code = g.code AND c.w = g.w)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${px}pq0 AS (SELECT vec_id,
       |    unnest(range(0, len(embedding))) AS d,
       |    unnest(embedding) AS x
       |  FROM embeddings WHERE embedding IS NOT NULL),
       |${px}pqpts AS (SELECT vec_id, d // 8 AS s, d % 8 AS w,
       |    CAST(floor(x::DOUBLE * 1048576) AS BIGINT) AS q FROM ${px}pq0),
       |${px}pqtrain AS (SELECT * FROM ${px}pqpts WHERE $trainPred),
       |${px}pqseeds AS (SELECT vec_id,
       |    row_number() OVER (ORDER BY vec_id) - 1 AS code
       |  FROM (SELECT vec_id FROM embeddings WHERE embedding IS NOT NULL
       |        AND ($trainPred) ORDER BY vec_id LIMIT $ksub)),
       |${px}cb0 AS (SELECT p.s, sd.code, p.w, p.q AS v
       |  FROM ${px}pqseeds sd JOIN ${px}pqtrain p USING (vec_id)),
       |$iters,
       |${px}fdist AS (SELECT p.vec_id, c.s, c.code,
       |    sum((p.q - c.v) * (p.q - c.v)) AS dist
       |  FROM ${px}pqpts p JOIN ${px}cb2 c ON p.s = c.s AND p.w = c.w
       |  GROUP BY 1, 2, 3),
       |${px}fcodes AS (SELECT vec_id, s, code FROM (
       |    SELECT vec_id, s, code,
       |      row_number() OVER (PARTITION BY vec_id, s ORDER BY dist, code) AS rn
       |    FROM ${px}fdist) WHERE rn = 1)""".stripMargin
  }

  private lazy val PqCte: String = pqCteOn("TRUE")

  /** Shared IVF-ADC replay (q_ann_ivfpq AND its layout round-trip
    * q_ann_layout, whose result must be identical): PqCte's trained
    * codes + cosine cell assignment + probed-cell ADC ranking. */
  private lazy val IvfPqOracle: String =
    s"""$PqCte,
      |cent AS (SELECT vec_id AS cell, embedding::DOUBLE[] AS cv
      |         FROM embeddings WHERE vec_id < 16),
      |casg AS (SELECT e.vec_id, c.cell,
      |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
      |      ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.cv) DESC,
      |               c.cell) AS rn
      |  FROM embeddings e CROSS JOIN cent c
      |  WHERE e.embedding IS NOT NULL),
      |corpcell AS (SELECT vec_id, cell FROM casg WHERE rn = 1),
      |qprobe AS (SELECT vec_id AS qid, cell FROM casg
      |           WHERE vec_id < 10 AND rn <= 4),
      |adc AS (SELECT qd.vec_id AS query_id, nc.vec_id AS neighbor_id,
      |    CAST(sum(qd.dist) AS BIGINT) AS adist
      |  FROM fdist qd
      |  JOIN fcodes nc ON qd.s = nc.s AND qd.code = nc.code
      |  JOIN corpcell cc ON cc.vec_id = nc.vec_id
      |  JOIN qprobe qp ON qp.qid = qd.vec_id AND qp.cell = cc.cell
      |  WHERE nc.vec_id <> qd.vec_id
      |  GROUP BY 1, 2),
      |pqr AS (SELECT query_id, neighbor_id, adist,
      |    row_number() OVER (PARTITION BY query_id
      |      ORDER BY adist, neighbor_id) AS rank
      |  FROM adc)
      |SELECT query_id, neighbor_id, adist, rank
      |FROM pqr WHERE rank <= 5""".stripMargin

  /** q_ann_recall's replay: the exact brute top-10, every approximate
    * method's top-10 (IVF at nprobe 1/2/4, brute ADC over PqCte's
    * trained codes, IVF-PQ), and the integer intersection counts — all
    * over the UNBIASED md5-rank query sample (`rq`, the advisors'
    * spelling), plus the one retained `ivf_n1_biased` contrast row over
    * the old `vec_id < 10` sample with its own biased baseline. */
  private lazy val AnnRecallOracle: String = {
    val RqPred = "vec_id IN (SELECT vec_id FROM rq)"
    def ivfTop(np: Int): String =
      s"""iv${np}s AS (SELECT pr.qid, c.vec_id AS nid,
         |    list_cosine_similarity(pr.qv::DOUBLE[], c.embedding::DOUBLE[]) AS cos
         |  FROM (SELECT vec_id AS qid, embedding AS qv, cell FROM rasg
         |        WHERE $RqPred AND rn <= $np) pr
         |  JOIN rcorp c ON pr.cell = c.cell AND c.vec_id <> pr.qid),
         |iv$np AS (SELECT qid, nid FROM (
         |    SELECT qid, nid, ROW_NUMBER() OVER (PARTITION BY qid
         |      ORDER BY cos DESC, nid) AS rn2 FROM iv${np}s)
         |  WHERE rn2 <= 10)""".stripMargin
    def rec(name: String, cte: String, ex: String = "ex"): String =
      s"""SELECT '$name' AS method,
         |  (SELECT count(*) FROM $cte a JOIN $ex USING (qid, nid)) AS hits,
         |  (SELECT count(*) FROM $ex) AS possible""".stripMargin
    s"""$PqCte,
       |rq AS (SELECT vec_id FROM (
       |    SELECT vec_id, md5(vec_id::VARCHAR) AS r FROM embeddings
       |    WHERE embedding IS NOT NULL ORDER BY r, vec_id LIMIT 10)),
       |exs AS (SELECT q.vec_id AS qid, c.vec_id AS nid,
       |    list_cosine_similarity(q.embedding::DOUBLE[],
       |      c.embedding::DOUBLE[]) AS cos
       |  FROM embeddings q CROSS JOIN embeddings c
       |  WHERE q.$RqPred AND c.vec_id <> q.vec_id),
       |ex AS (SELECT qid, nid FROM (
       |    SELECT qid, nid, ROW_NUMBER() OVER (PARTITION BY qid
       |      ORDER BY cos DESC, nid) AS rn FROM exs) WHERE rn <= 10),
       |$IvfCellCte,
       |${pqResCteP("r", SeedCentQuantBody,
        asg = "rasg", corp = "rcorp", nprobe = 4, qPred = RqPred)},
       |rtop AS (SELECT query_id AS qid, neighbor_id AS nid FROM rres
       |         WHERE rank <= 10),
       |${KMeansCte.stripPrefix("WITH ")},
       |kcent AS (SELECT cluster AS cell, list(v::DOUBLE ORDER BY d) AS cv
       |          FROM c3 GROUP BY 1),
       |kasg AS (SELECT e.vec_id, c.cell,
       |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |      ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.cv) DESC,
       |               c.cell) AS rn
       |  FROM embeddings e CROSS JOIN kcent c
       |  WHERE e.embedding IS NOT NULL),
       |kcorp AS (SELECT vec_id, cell FROM kasg WHERE rn = 1),
       |${pqResCteP("k",
        "SELECT cluster AS cell, d // 8 AS s, d % 8 AS w, v FROM c3",
        asg = "kasg", corp = "kcorp", nprobe = 2, qPred = RqPred)},
       |ktop AS (SELECT query_id AS qid, neighbor_id AS nid FROM kres
       |         WHERE rank <= 10),
       |${ivfTop(1)},
       |${ivfTop(2)},
       |${ivfTop(4)},
       |pqadc AS (SELECT qd.vec_id AS qid, nc.vec_id AS nid,
       |    CAST(sum(qd.dist) AS BIGINT) AS adist
       |  FROM fdist qd JOIN fcodes nc ON qd.s = nc.s AND qd.code = nc.code
       |  WHERE qd.$RqPred AND nc.vec_id <> qd.vec_id
       |  GROUP BY 1, 2),
       |pqb AS (SELECT qid, nid FROM (
       |    SELECT qid, nid, row_number() OVER (PARTITION BY qid
       |      ORDER BY adist, nid) AS rn FROM pqadc) WHERE rn <= 10),
       |ipadc AS (SELECT qd.vec_id AS qid, nc.vec_id AS nid,
       |    CAST(sum(qd.dist) AS BIGINT) AS adist
       |  FROM fdist qd
       |  JOIN fcodes nc ON qd.s = nc.s AND qd.code = nc.code
       |  JOIN rcorp cc ON cc.vec_id = nc.vec_id
       |  JOIN (SELECT vec_id AS qid2, cell FROM rasg
       |        WHERE $RqPred AND rn <= 4) qp
       |    ON qp.qid2 = qd.vec_id AND qp.cell = cc.cell
       |  WHERE nc.vec_id <> qd.vec_id
       |  GROUP BY 1, 2),
       |ipq AS (SELECT qid, nid FROM (
       |    SELECT qid, nid, row_number() OVER (PARTITION BY qid
       |      ORDER BY adist, nid) AS rn FROM ipadc) WHERE rn <= 10),
       |${lshMpCtes("mp_", qPred = s"q.$RqPred")},
       |mtop AS (SELECT qid, nid FROM (
       |    SELECT c.qid, c.nid,
       |      row_number() OVER (PARTITION BY c.qid
       |        ORDER BY x.cos DESC, c.nid) AS rn
       |    FROM mp_cand c JOIN exs x ON x.qid = c.qid AND x.nid = c.nid)
       |  WHERE rn <= 10),
       |bexs AS (SELECT q.vec_id AS qid, c.vec_id AS nid,
       |    list_cosine_similarity(q.embedding::DOUBLE[],
       |      c.embedding::DOUBLE[]) AS cos
       |  FROM embeddings q CROSS JOIN embeddings c
       |  WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id),
       |bex AS (SELECT qid, nid FROM (
       |    SELECT qid, nid, ROW_NUMBER() OVER (PARTITION BY qid
       |      ORDER BY cos DESC, nid) AS rn FROM bexs) WHERE rn <= 10),
       |bivs AS (SELECT pr.qid, c.vec_id AS nid,
       |    list_cosine_similarity(pr.qv::DOUBLE[], c.embedding::DOUBLE[]) AS cos
       |  FROM (SELECT vec_id AS qid, embedding AS qv, cell FROM rasg
       |        WHERE vec_id < 10 AND rn <= 1) pr
       |  JOIN rcorp c ON pr.cell = c.cell AND c.vec_id <> pr.qid),
       |biv AS (SELECT qid, nid FROM (
       |    SELECT qid, nid, ROW_NUMBER() OVER (PARTITION BY qid
       |      ORDER BY cos DESC, nid) AS rn2 FROM bivs)
       |  WHERE rn2 <= 10),
       |rec AS (
       |  ${rec("ivf_n1", "iv1")}
       |  UNION ALL ${rec("ivf_n2", "iv2")}
       |  UNION ALL ${rec("ivf_n4", "iv4")}
       |  UNION ALL ${rec("pq", "pqb")}
       |  UNION ALL ${rec("ivfpq", "ipq")}
       |  UNION ALL ${rec("ivfpq_res", "rtop")}
       |  UNION ALL ${rec("ivfpq_res_km", "ktop")}
       |  UNION ALL ${rec("lsh_mp", "mtop")}
       |  UNION ALL ${rec("ivf_n1_biased", "biv", ex = "bex")})
       |SELECT method, hits, possible,
       |  hits::DOUBLE / possible AS recall
       |FROM rec""".stripMargin
  }

  /** q_ann_advise's replay: the md5-rank query sample, the exact brute
    * top-5 baseline, BOTH seed quantizers (nlist 8 and 16 — cells by
    * ascending-id row number), every (nlist, nprobe) search's hit
    * count, and the choice rule itself (min probed fraction among
    * configurations meeting the 0.6 floor; ties to larger nlist then
    * higher recall). */
  /** Shared by q_ann_lsh_mp and q_ann_lsh_layout (the persisted
    * index must be row-invisible): the full multi-probe replay.
    */
  /** The multi-probe candidate CTE chain (default: 2 tables x 6 bits x
    * 2 single-bit probes over the standard vec_id < 10 queries), CTE
    * names prefixed with `px` so callers can compose it: emits `${px}e`
    * (null-guarded corpus), `${px}csig` (corpus signatures), and
    * `${px}cand` (distinct exclude-self candidate pairs). ONE
    * definition of the probe recipe on the SQL side — q_ann_lsh_mp /
    * q_ann_lsh_layout / q_ann_lsh_lifecycle rerank it at k = 5, the
    * recall harness (which swaps `qPred` for its unbiased md5-rank
    * sample) intersects it with the exact top-10, and q_ann_lsh_mp2
    * instantiates `order = 2` (perturbation sets = singles ∪ pairs
    * ranked by total |margin| — the multi-bit Lv et al. prefix, XOR of
    * the whole set). */
  private def lshMpCtes(px: String,
      qPred: String = "q.vec_id < 10",
      tables: Int = 2, bits: Int = 6, probes: Int = 2,
      order: Int = 1): String = {
    val probeCte =
      if (order == 1)
        s"""${px}qr AS (SELECT vec_id, tbl, i,
           |    row_number() OVER (PARTITION BY vec_id, tbl ORDER BY abs(dot), i) AS rn
           |  FROM ${px}qd),
           |${px}probes AS (
           |  SELECT vec_id, tbl, base AS sig FROM ${px}qs
           |  UNION ALL
           |  SELECT r.vec_id, r.tbl, xor(s.base, CAST(1::BIGINT << r.i AS BIGINT)) AS sig
           |  FROM ${px}qr r JOIN ${px}qs s ON r.vec_id = s.vec_id AND r.tbl = s.tbl
           |  WHERE r.rn <= $probes)""".stripMargin
      else
        s"""${px}ps AS (
           |  SELECT vec_id, tbl, [i] AS bs, abs(dot) AS m FROM ${px}qd
           |  UNION ALL
           |  SELECT a.vec_id, a.tbl, [a.i, b.i] AS bs,
           |    abs(a.dot) + abs(b.dot) AS m
           |  FROM ${px}qd a JOIN ${px}qd b
           |    ON a.vec_id = b.vec_id AND a.tbl = b.tbl AND a.i < b.i),
           |${px}qr AS (SELECT vec_id, tbl, bs,
           |    row_number() OVER (PARTITION BY vec_id, tbl ORDER BY m, bs) AS rn
           |  FROM ${px}ps),
           |${px}probes AS (
           |  SELECT vec_id, tbl, base AS sig FROM ${px}qs
           |  UNION ALL
           |  SELECT r.vec_id, r.tbl,
           |    xor(s.base, CAST(coalesce(list_sum(
           |      [1::BIGINT << b FOR b IN r.bs]), 0) AS BIGINT)) AS sig
           |  FROM ${px}qr r JOIN ${px}qs s ON r.vec_id = s.vec_id AND r.tbl = s.tbl
           |  WHERE r.rn <= $probes)""".stripMargin
    s"""${px}e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       |  WHERE embedding IS NOT NULL),
       |${px}t AS (SELECT unnest(range(0, $tables)) AS tbl),
       |${px}csig AS (
       |  SELECT e.vec_id, t.tbl,
       |    CAST(coalesce(list_sum([CASE WHEN
       |        coalesce(list_sum([e.v[d + 1] *
       |          ((((t.tbl + 1) * 7919 + (i + 1) * 104729 + (d + 1) * 1299709)
       |            % 1000003 % 2001) / 1000.0 - 1.0)
       |          FOR d IN range(0, 64)]), 0.0) > 0
       |      THEN 1::BIGINT << i ELSE 0 END FOR i IN range(0, $bits)]), 0) AS BIGINT) AS sig
       |  FROM ${px}e e CROSS JOIN ${px}t t),
       |${px}qd AS (SELECT q.vec_id, t.tbl, u.i,
       |    coalesce(list_sum([q.v[d + 1] *
       |      ((((t.tbl + 1) * 7919 + (u.i + 1) * 104729 + (d + 1) * 1299709)
       |        % 1000003 % 2001) / 1000.0 - 1.0)
       |      FOR d IN range(0, 64)]), 0.0) AS dot
       |  FROM ${px}e q CROSS JOIN ${px}t t
       |  CROSS JOIN (SELECT unnest(range(0, $bits)) AS i) u
       |  WHERE $qPred),
       |${px}qs AS (SELECT vec_id, tbl,
       |    CAST(coalesce(sum(CASE WHEN dot > 0 THEN 1::BIGINT << i ELSE 0 END), 0)
       |      AS BIGINT) AS base
       |  FROM ${px}qd GROUP BY 1, 2),
       |$probeCte,
       |${px}cand AS (SELECT DISTINCT p.vec_id AS qid, c.vec_id AS nid
       |  FROM ${px}probes p JOIN ${px}csig c
       |    ON p.tbl = c.tbl AND p.sig = c.sig AND c.vec_id <> p.vec_id)""".stripMargin
  }

  private lazy val LshMpOracle: String =
    s"""WITH ${lshMpCtes("")},
       |sc AS (SELECT cand.qid, cand.nid,
       |    list_cosine_similarity(a.v, b.v) AS cos
       |  FROM cand JOIN e a ON a.vec_id = cand.qid
       |            JOIN e b ON b.vec_id = cand.nid),
       |rk AS (SELECT qid, nid, cos,
       |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
       |  FROM sc)
       |SELECT qid AS query_id, nid AS neighbor_id,
       |  ROUND(cos + 1e-9, 6) + 0.0 AS cosine, rank
       |FROM rk WHERE rank <= 5""".stripMargin

  /** q_ann_lsh_mp2's replay: the order-2 probe chain (1 table, 6 bits,
    * 6 scored perturbation sets), then the same rerank tail. */
  private lazy val LshMp2Oracle: String =
    s"""WITH ${lshMpCtes("", tables = 1, probes = 6, order = 2)},
       |sc AS (SELECT cand.qid, cand.nid,
       |    list_cosine_similarity(a.v, b.v) AS cos
       |  FROM cand JOIN e a ON a.vec_id = cand.qid
       |            JOIN e b ON b.vec_id = cand.nid),
       |rk AS (SELECT qid, nid, cos,
       |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
       |  FROM sc)
       |SELECT qid AS query_id, nid AS neighbor_id,
       |  ROUND(cos + 1e-9, 6) + 0.0 AS cosine, rank
       |FROM rk WHERE rank <= 5""".stripMargin


  /** Full replay of [[q_lsh_advise]]: md5-rank sample → 3-gram shingles
    * → inverted-index exact Jaccard pairs → 16 md5-minhashes → per-band
    * bucket keys (`string_agg ORDER BY i` ≡ the Spark slice order) →
    * distinct candidate pairs per banding → the choice rule (min
    * candidates, ties by hits DESC then fewer bands — hits-ordering ≡
    * recall-ordering, same denominator).
    */
  private lazy val LshAdviseOracle: String = {
    val k = 16
    val bandsVals = "(VALUES (2), (4), (8), (16))"
    s"""WITH samp AS (SELECT doc_id, text FROM documents
       |    WHERE text IS NOT NULL
       |    ORDER BY md5(doc_id::VARCHAR), doc_id LIMIT 256),
       |dd AS (SELECT doc_id, tk FROM
       |    (SELECT doc_id, $ToksExpr AS tk FROM samp)
       |    WHERE len(tk) >= 1),
       |gg AS (SELECT doc_id, sh FROM (
       |    SELECT doc_id, list_distinct(
       |      [list_aggregate(tk[i:i+2], 'string_agg', ' ')
       |       FOR i IN range(1, greatest(len(tk) - 2, 1) + 1)]) AS sh
       |    FROM dd) WHERE len(sh) > 0),
       |p AS (SELECT doc_id, u.s AS gr, len(sh) AS n
       |  FROM gg, unnest(sh) AS u(s)),
       |tp AS (SELECT a.doc_id AS id_l, b.doc_id AS id_r,
       |    a.n AS n_l, b.n AS n_r, count(*) AS inter
       |  FROM p a JOIN p b ON a.gr = b.gr AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2, 3, 4),
       |truth AS (SELECT id_l, id_r FROM tp
       |  WHERE inter::DOUBLE / (n_l + n_r - inter) >= 0.8),
       |h AS (SELECT doc_id, t.i AS i,
       |    min(('0x' || substring(md5(t.i::VARCHAR || ':' || u.s), 1, 15))::BIGINT) AS mh
       |  FROM gg, unnest(sh) AS u(s)
       |  CROSS JOIN generate_series(0, ${k - 1}) AS t(i)
       |  GROUP BY doc_id, t.i),
       |bu AS (SELECT doc_id, bt.b AS b, (h.i // ($k // bt.b))::INT AS band,
       |    string_agg(h.mh::VARCHAR, ',' ORDER BY h.i) AS key
       |  FROM h CROSS JOIN $bandsVals AS bt(b)
       |  GROUP BY doc_id, bt.b, h.i // ($k // bt.b)),
       |bh AS (SELECT doc_id, b, band,
       |    ('0x' || substring(md5(band::VARCHAR || ':' || key), 1, 15))::BIGINT AS bucket
       |  FROM bu),
       |cand AS (SELECT DISTINCT x.b, x.doc_id AS id_l, y.doc_id AS id_r
       |  FROM bh x JOIN bh y ON x.b = y.b AND x.band = y.band
       |    AND x.bucket = y.bucket AND x.doc_id < y.doc_id),
       |cs AS (SELECT c.b, count(*) AS candidates, count(t.id_l) AS hits
       |  FROM cand c LEFT JOIN truth t
       |    ON c.id_l = t.id_l AND c.id_r = t.id_r
       |  GROUP BY c.b),
       |tbl AS (SELECT bt.b AS num_bands, ($k // bt.b) AS rows_per_band,
       |    round(1 - power(1 - power(0.8, $k // bt.b), bt.b), 6) + 0.0 AS s_curve,
       |    (SELECT count(*) FROM truth) AS true_pairs,
       |    coalesce(cs.candidates, 0) AS candidates,
       |    coalesce(cs.hits, 0) AS hits,
       |    (CASE WHEN (SELECT count(*) FROM truth) = 0 THEN 1.0
       |      ELSE coalesce(cs.hits, 0)::DOUBLE
       |        / (SELECT count(*) FROM truth) END) AS recall
       |  FROM $bandsVals AS bt(b) LEFT JOIN cs ON cs.b = bt.b),
       |ch AS (SELECT num_bands FROM tbl WHERE recall >= 0.9
       |  ORDER BY candidates, hits DESC, num_bands LIMIT 1)
       |SELECT t.num_bands, t.rows_per_band, t.s_curve, t.true_pairs,
       |  t.candidates, t.hits, t.recall,
       |  (CASE WHEN t.num_bands = (SELECT num_bands FROM ch)
       |    THEN 1 ELSE 0 END) AS chosen
       |FROM tbl t""".stripMargin
  }

  /** q_ann_advise's replay: the md5-rank query sample, the exact brute
    * top-5 baseline, BOTH seed quantizers (nlist 8/16), the
    * integer-Lloyd-TRAINED nlist=8 quantizer (KMeansCte — the
    * q_ann_ivf_trained training replayed inside the advisor), the
    * HASH-probe family (lshMpCtes over the same sample — the shipped
    * 2-table/6-bit/2-probe multi-probe chain, exact-cosine reranked),
    * every configuration's hit count, and the choice rule itself (min
    * probed fraction meeting the 0.6 floor; ties to larger nlist,
    * higher recall, then quantizer name). */
  private lazy val AnnAdviseOracle: String = {
    val nlists = Seq(8, 16)
    val nprobes = Seq(1, 2, 4)
    val quantizers = nlists.map { nl =>
      s"""cent$nl AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
         |    embedding::DOUBLE[] AS cv
         |  FROM (SELECT vec_id, embedding FROM embeddings
         |        WHERE embedding IS NOT NULL ORDER BY vec_id LIMIT $nl)),
         |asg$nl AS (SELECT e.vec_id, e.embedding, c.cell,
         |    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
         |      list_cosine_similarity(e.embedding::DOUBLE[], c.cv) DESC,
         |      c.cell) AS rn
         |  FROM embeddings e CROSS JOIN cent$nl c
         |  WHERE e.embedding IS NOT NULL),
         |corp$nl AS (SELECT vec_id, embedding, cell FROM asg$nl
         |            WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    val legs = (for (nl <- nlists; np <- nprobes) yield
      s"""a${nl}_$np AS (SELECT count(*) AS hits FROM (
         |  SELECT t.qid, t.nid FROM (
         |    SELECT pr.qid, c.vec_id AS nid,
         |      ROW_NUMBER() OVER (PARTITION BY pr.qid ORDER BY
         |        list_cosine_similarity(pr.qv, c.embedding::DOUBLE[]) DESC,
         |        c.vec_id) AS rn
         |    FROM (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv, cell
         |          FROM asg$nl WHERE rn <= $np
         |            AND vec_id IN (SELECT vec_id FROM advq)) pr
         |    JOIN corp$nl c ON pr.cell = c.cell AND c.vec_id <> pr.qid) t
         |  WHERE t.rn <= 5) s
         |  JOIN advex ON s.qid = advex.qid AND s.nid = advex.nid)"""
        .stripMargin).mkString(",\n")
    // trained-quantizer legs: KMeansCte's c3 centroids (k=8, 3 integer
    // Lloyd iterations — q_ann_ivf_trained's training) as cosine cells
    val trainedLegs = nprobes.map { np =>
      s"""t8_$np AS (SELECT count(*) AS hits FROM (
         |  SELECT t.qid, t.nid FROM (
         |    SELECT pr.qid, c.vec_id AS nid,
         |      ROW_NUMBER() OVER (PARTITION BY pr.qid ORDER BY
         |        list_cosine_similarity(pr.qv, c.embedding::DOUBLE[]) DESC,
         |        c.vec_id) AS rn
         |    FROM (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv, cell
         |          FROM tkasg WHERE rn <= $np
         |            AND vec_id IN (SELECT vec_id FROM advq)) pr
         |    JOIN tkcorp c ON pr.cell = c.cell AND c.vec_id <> pr.qid) t
         |  WHERE t.rn <= 5) s
         |  JOIN advex ON s.qid = advex.qid AND s.nid = advex.nid)"""
        .stripMargin
    }.mkString(",\n")
    // the hash-probe leg: the shipped q_ann_lsh_mp probe chain
    // (lshMpCtes, prefix av_) instantiated over the advisor's md5-rank
    // sample, exact-cosine reranked at k = 5, intersected with the
    // shared exact baseline — quantizer = 'lsh_mp', priced as
    // nlist = 2^6, nprobe = 2·(1+2)
    val lshLeg =
      s"""l_6_2_2 AS (SELECT count(*) AS hits FROM (
         |  SELECT t.qid, t.nid FROM (
         |    SELECT c.qid, c.nid, ROW_NUMBER() OVER (PARTITION BY c.qid
         |      ORDER BY list_cosine_similarity(a.v, b.v) DESC, c.nid) AS rn
         |    FROM av_cand c JOIN av_e a ON a.vec_id = c.qid
         |                   JOIN av_e b ON b.vec_id = c.nid) t
         |  WHERE t.rn <= 5) s
         |  JOIN advex ON s.qid = advex.qid AND s.nid = advex.nid)"""
        .stripMargin
    val rows = ((for (nl <- nlists; np <- nprobes) yield
      s"SELECT 'seed' AS quantizer, $nl AS nlist, $np AS nprobe, " +
        s"(SELECT hits FROM a${nl}_$np) AS hits") ++
      nprobes.map(np =>
        s"SELECT 'kmeans' AS quantizer, 8 AS nlist, $np AS nprobe, " +
          s"(SELECT hits FROM t8_$np) AS hits") ++
      Seq("SELECT 'lsh_mp' AS quantizer, 64 AS nlist, 6 AS nprobe, " +
        "(SELECT hits FROM l_6_2_2) AS hits")).mkString("\n  UNION ALL ")
    s"""WITH advq AS (SELECT vec_id FROM (
       |    SELECT vec_id, md5(vec_id::VARCHAR) AS r FROM embeddings
       |    WHERE embedding IS NOT NULL ORDER BY r, vec_id LIMIT 8)),
       |advexs AS (SELECT q.vec_id AS qid, c.vec_id AS nid,
       |    list_cosine_similarity(q.embedding::DOUBLE[],
       |      c.embedding::DOUBLE[]) AS cos
       |  FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
       |  WHERE q.vec_id IN (SELECT vec_id FROM advq)
       |    AND q.embedding IS NOT NULL AND c.embedding IS NOT NULL),
       |advex AS (SELECT qid, nid FROM (
       |    SELECT qid, nid, ROW_NUMBER() OVER (PARTITION BY qid
       |      ORDER BY cos DESC, nid) AS rn FROM advexs) WHERE rn <= 5),
       |$quantizers,
       |${KMeansCte.stripPrefix("WITH ")},
       |tkcent AS (SELECT cluster AS cell, list(v::DOUBLE ORDER BY d) AS cv
       |           FROM c3 GROUP BY cluster),
       |tkasg AS (SELECT e.vec_id, e.embedding, c.cell,
       |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |      ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.cv) DESC,
       |               c.cell) AS rn
       |  FROM embeddings e CROSS JOIN tkcent c
       |  WHERE e.embedding IS NOT NULL),
       |tkcorp AS (SELECT vec_id, embedding, cell FROM tkasg WHERE rn = 1),
       |${lshMpCtes("av_",
          qPred = "q.vec_id IN (SELECT vec_id FROM advq)")},
       |$legs,
       |$trainedLegs,
       |$lshLeg,
       |tbl AS ($rows),
       |res AS (SELECT quantizer, nlist, nprobe,
       |    hits::DOUBLE / (SELECT count(*) FROM advex) AS recall FROM tbl),
       |ch AS (SELECT quantizer, nlist, nprobe FROM res WHERE recall >= 0.6
       |       ORDER BY nprobe::DOUBLE / nlist ASC, nlist DESC, recall DESC,
       |         quantizer ASC
       |       LIMIT 1)
       |SELECT r.quantizer, r.nlist, r.nprobe, r.recall,
       |  (CASE WHEN c.nlist IS NOT NULL THEN 1 ELSE 0 END) AS chosen
       |FROM res r LEFT JOIN ch c
       |  ON r.quantizer = c.quantizer AND r.nlist = c.nlist
       |    AND r.nprobe = c.nprobe""".stripMargin
  }

  /** Shared cosine cell assignment (nlist = 16 seed centroids): corpus
    * cells (`rcorp`) and the full rank frame (`rasg`, probe lists via
    * `rn <= nprobe`). */
  private val IvfCellCte: String =
    """rcent AS (SELECT vec_id AS cell, embedding::DOUBLE[] AS cv
      |          FROM embeddings WHERE vec_id < 16),
      |rasg AS (SELECT e.vec_id, e.embedding, c.cell,
      |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
      |      ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.cv) DESC,
      |               c.cell) AS rn
      |  FROM embeddings e CROSS JOIN rcent c
      |  WHERE e.embedding IS NOT NULL),
      |rcorp AS (SELECT vec_id, embedding, cell FROM rasg WHERE rn = 1)"""
      .stripMargin

  /** Residual-PQ replay (q_ann_ivfpq_res; also the `ivfpq_res` leg of
    * q_ann_recall): quantized cell centroids (`cq`), residual points
    * (`rpts`), PqCte-shaped integer Lloyd over the residuals
    * (`rcb0..rcb2`), final residual codes (`rfcodes`), per-(query,
    * probed cell) residual lookup tables (`rqlut`), and the ranked ADC
    * scan (`rres`). Assumes `pqpts`/`pqseeds` (from PqCte) and
    * `rasg`/`rcorp` (from IvfCellCte) are in scope.
    */
  /** Quantized nlist=16 seed centroids as (cell, s, w, v) — the `cqBody`
    * both residual instantiations over [[IvfCellCte]]'s cells share. */
  private val SeedCentQuantBody: String =
    """SELECT cell, d // 8 AS s, d % 8 AS w,
      |    CAST(floor(x::DOUBLE * 1048576) AS BIGINT) AS v
      |  FROM (SELECT vec_id AS cell, unnest(range(0, len(embedding))) AS d,
      |          unnest(embedding) AS x
      |        FROM embeddings WHERE vec_id < 16)""".stripMargin

  private val PqResCte: String = pqResCteP("r", SeedCentQuantBody,
    asg = "rasg", corp = "rcorp", nprobe = 4)

  /** Parameterized residual-PQ replay: every CTE name carries prefix
    * `p` so two instantiations (seed-centroid cells vs k-means-trained
    * cells — the `ivfpq_res` / `ivfpq_res_km` recall legs) coexist in
    * one statement. `cqBody` yields the quantized coarse centroids as
    * (cell, s, w, v); `asg`/`corp` name the cell-rank and corpus-cell
    * CTEs in scope; `qPred` selects the query ids (the recall harness
    * swaps in its unbiased md5-rank sample); assumes `pqpts`/`pqseeds`
    * from PqCte. */
  private def pqResCteP(p: String, cqBody: String, asg: String,
                        corp: String, nprobe: Int,
                        qPred: String = "vec_id < 10"): String = {
    val iters = (1 to 2).map { i =>
      val prev = s"${p}cb${i - 1}"
      s"""${p}pdist$i AS (SELECT p.vec_id, c.s, c.code,
         |    sum((p.q - c.v) * (p.q - c.v)) AS dist
         |  FROM ${p}pts p JOIN $prev c ON p.s = c.s AND p.w = c.w
         |  GROUP BY 1, 2, 3),
         |${p}pa$i AS (SELECT vec_id, s, code,
         |    row_number() OVER (PARTITION BY vec_id, s ORDER BY dist, code) AS rn
         |  FROM ${p}pdist$i),
         |${p}pagg$i AS (SELECT a.s, a.code, p.w, sum(p.q) AS sm, count(*) AS n
         |  FROM ${p}pts p JOIN (SELECT vec_id, s, code FROM ${p}pa$i WHERE rn = 1) a
         |    ON p.vec_id = a.vec_id AND p.s = a.s
         |  GROUP BY 1, 2, 3),
         |${p}cb$i AS (SELECT c.s, c.code, c.w, coalesce(g.sm // g.n, c.v) AS v
         |  FROM $prev c LEFT JOIN ${p}pagg$i g
         |    ON c.s = g.s AND c.code = g.code AND c.w = g.w)""".stripMargin
    }.mkString(",\n")
    s"""${p}cq AS ($cqBody),
       |${p}pts AS (SELECT p.vec_id, p.s, p.w, p.q - cq.v AS q
       |  FROM pqpts p JOIN $corp cc ON cc.vec_id = p.vec_id
       |  JOIN ${p}cq cq ON cq.cell = cc.cell AND cq.s = p.s AND cq.w = p.w),
       |${p}cb0 AS (SELECT p.s, sd.code, p.w, p.q AS v
       |  FROM pqseeds sd JOIN ${p}pts p USING (vec_id)),
       |$iters,
       |${p}fdist AS (SELECT p.vec_id, c.s, c.code,
       |    sum((p.q - c.v) * (p.q - c.v)) AS dist
       |  FROM ${p}pts p JOIN ${p}cb2 c ON p.s = c.s AND p.w = c.w
       |  GROUP BY 1, 2, 3),
       |${p}fcodes AS (SELECT vec_id, s, code FROM (
       |    SELECT vec_id, s, code,
       |      row_number() OVER (PARTITION BY vec_id, s ORDER BY dist, code) AS rn
       |    FROM ${p}fdist) WHERE rn = 1),
       |${p}qlut AS (SELECT qp.qid, qp.cell, c.s, c.code,
       |    sum((p.q - cq.v - c.v) * (p.q - cq.v - c.v)) AS dist
       |  FROM (SELECT vec_id AS qid, cell FROM $asg
       |        WHERE ($qPred) AND rn <= $nprobe) qp
       |  JOIN pqpts p ON p.vec_id = qp.qid
       |  JOIN ${p}cq cq ON cq.cell = qp.cell AND cq.s = p.s AND cq.w = p.w
       |  JOIN ${p}cb2 c ON c.s = p.s AND c.w = p.w
       |  GROUP BY 1, 2, 3, 4),
       |${p}adc AS (SELECT ql.qid AS query_id, nc.vec_id AS neighbor_id,
       |    CAST(sum(ql.dist) AS BIGINT) AS adist
       |  FROM ${p}qlut ql
       |  JOIN $corp cc ON cc.cell = ql.cell
       |  JOIN ${p}fcodes nc ON nc.vec_id = cc.vec_id
       |    AND nc.s = ql.s AND nc.code = ql.code
       |  WHERE nc.vec_id <> ql.qid
       |  GROUP BY 1, 2),
       |${p}res AS (SELECT query_id, neighbor_id, adist,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY adist, neighbor_id) AS rank
       |  FROM ${p}adc)""".stripMargin
  }

  /** q_ann_layout_append's replay: PQ training restricted to the base
    * (vec_id % 5 ≠ 0) via [[pqCteOn]] — `fdist`/`fcodes` still encode
    * EVERY vector with the frozen codebooks — plus base-seeded IVF
    * cells and the probed ADC search over the union corpus. */
  private lazy val LayoutAppendOracle: String =
    s"""${pqCteOn("vec_id % 5 <> 0")},
       |acent AS (SELECT vec_id AS cell, embedding::DOUBLE[] AS cv
       |  FROM (SELECT vec_id, embedding FROM embeddings
       |        WHERE vec_id % 5 <> 0 ORDER BY vec_id LIMIT 16)),
       |aasg AS (SELECT e.vec_id, c.cell,
       |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |      ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.cv) DESC,
       |               c.cell) AS rn
       |  FROM embeddings e CROSS JOIN acent c
       |  WHERE e.embedding IS NOT NULL),
       |acorp AS (SELECT vec_id, cell FROM aasg WHERE rn = 1),
       |aadc AS (SELECT qd.vec_id AS query_id, nc.vec_id AS neighbor_id,
       |    CAST(sum(qd.dist) AS BIGINT) AS adist
       |  FROM fdist qd
       |  JOIN fcodes nc ON qd.s = nc.s AND qd.code = nc.code
       |  JOIN acorp cc ON cc.vec_id = nc.vec_id
       |  JOIN (SELECT vec_id AS qid, cell FROM aasg
       |        WHERE vec_id < 10 AND rn <= 4) qp
       |    ON qp.qid = qd.vec_id AND qp.cell = cc.cell
       |  WHERE nc.vec_id <> qd.vec_id
       |  GROUP BY 1, 2),
       |ares AS (SELECT query_id, neighbor_id, adist,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY adist, neighbor_id) AS rank
       |  FROM aadc)
       |SELECT query_id, neighbor_id, adist, rank
       |FROM ares WHERE rank <= 5""".stripMargin

  /** q_pipeline5's stage CTEs (d0 and the six gate survivors q1..q6),
    * shared verbatim by the chain rollup's oracle and the funnel
    * re-aggregation (`q_funnel_pipeline` — agreement pins both the
    * memberships and the attrition arithmetic). Callers must open with
    * `WITH RECURSIVE` (reach/reach5). CAUTION: callers interpolate this
    * (already-stripped) text into their own `.stripMargin` strings, so
    * no rendered line here may begin with whitespace-then-`|` — the
    * outer strip would eat one pipe (the `||` concatenations in `syn`
    * sit at end-of-line for exactly that reason). Stage CTEs are
    * MATERIALIZED:
    * each is referenced 2-3× downstream, and inlining re-evaluates the
    * whole chain below it per reference (measured: the un-hinted plan
    * exhausts the fd limit re-opening the parquet). */
  private lazy val Pipeline5StageCtes: String =
    s"""d0 AS (SELECT doc_id, text, lang, source FROM documents
      |       UNION ALL
      |       SELECT doc_id + 100000, text, lang, source
      |       FROM documents WHERE doc_id % 7 = 0),
      |qt AS (SELECT doc_id, text, lang, source, $ToksExpr AS tk,
      |         list_filter(list_transform(string_split(text, chr(10)),
      |           x -> trim(x)), x -> len(x) > 0) AS lns
      |       FROM d0),
      |qs AS (SELECT doc_id, text, lang, source, len(tk) AS nt,
      |         CASE WHEN len(tk) = 0 THEN 0.0
      |              ELSE list_aggregate(list_transform(tk, x -> len(x)),
      |                     'sum')::DOUBLE / len(tk) END AS mtl,
      |         (len(text) - len(replace(text, '#', ''))
      |           + len(regexp_extract_all(text, '\\.{3}|…')))::DOUBLE
      |           / GREATEST(len(tk), 1) AS sr,
      |         len(list_filter(lns, x -> regexp_matches(x, '^[-*•]')))::DOUBLE
      |           / GREATEST(len(lns), 1) AS bf,
      |         len(list_filter(lns, x -> regexp_matches(x, '(\\.\\.\\.|…)$$')))::DOUBLE
      |           / GREATEST(len(lns), 1) AS ef,
      |         len(list_filter(tk, x -> regexp_matches(x, '[a-z]')))::DOUBLE
      |           / GREATEST(len(tk), 1) AS af,
      |         len(list_filter(['the','a','an','and','or','of','to','in','is',
      |           'are','was','for','on','with','as','by','at','it','that',
      |           'this'], w -> list_contains(tk, w))) AS nsw
      |       FROM qt),
      |q1 AS MATERIALIZED (SELECT doc_id, text, lang, source FROM qs
      |       WHERE nt BETWEEN 12 AND 1000 AND mtl >= 2.5 AND mtl <= 6.0
      |         AND sr <= 0.1 AND bf <= 0.9 AND ef <= 0.3
      |         AND af >= 0.8 AND nsw >= 1),
      |syn AS (SELECT doc_id,
      |    (CASE doc_id % 3 WHEN 0 THEN 'HTTP://' WHEN 1 THEN 'https://' ELSE 'http://' END) ||
      |    (CASE doc_id % 4 WHEN 0 THEN 'WWW.News' WHEN 1 THEN 'blog.Site' WHEN 2 THEN 'cdn.media' ELSE 'Docs.Portal' END) ||
      |    (CASE doc_id % 5 WHEN 0 THEN '.com' WHEN 1 THEN '.co.uk' WHEN 2 THEN '.org' WHEN 3 THEN '.com.au' ELSE '.io' END) ||
      |    (CASE WHEN doc_id % 11 = 0 THEN '/' ELSE '/p/' || doc_id::VARCHAR END) AS url
      |  FROM q1),
      |h AS (SELECT doc_id,
      |    lower(regexp_extract(trim(url), '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/:?#]+)', 1)) AS host
      |  FROM syn),
      |hd AS (SELECT doc_id, host,
      |    CASE WHEN regexp_matches(host, '\\.(co|com|net|org|ac|gov|edu)\\.[a-z][a-z]$$')
      |              AND regexp_extract(host, '([^.]+\\.[^.]+\\.[^.]+)$$', 1) <> ''
      |         THEN regexp_extract(host, '([^.]+\\.[^.]+\\.[^.]+)$$', 1)
      |         WHEN regexp_extract(host, '([^.]+\\.[^.]+)$$', 1) <> ''
      |         THEN regexp_extract(host, '([^.]+\\.[^.]+)$$', 1)
      |         ELSE host END AS dom
      |  FROM h),
      |bl(entry) AS (VALUES ('site.co.uk'), ('cdn.media.org'), ('news.com')),
      |q2 AS MATERIALIZED (SELECT q1.* FROM q1 JOIN hd USING (doc_id)
      |       WHERE NOT EXISTS (SELECT 1 FROM bl WHERE bl.entry = hd.host)
      |         AND NOT EXISTS (SELECT 1 FROM bl WHERE bl.entry = hd.dom)),
      |sv AS (SELECT MIN(doc_id) AS doc_id FROM q2 GROUP BY text),
      |q3 AS MATERIALIZED (SELECT q2.* FROM q2 JOIN sv USING (doc_id)),
      |dt AS (SELECT doc_id, $ToksExpr AS tk FROM q3),
      |dk AS (SELECT doc_id, list_distinct(
      |        [list_aggregate(tk[i:i+2], 'string_agg', ' ')
      |         FOR i IN range(1, greatest(len(tk) - 2, 1) + 1)]) AS sh FROM dt),
      |p4 AS (SELECT a.doc_id AS u, b.doc_id AS v
      |      FROM dk a JOIN dk b ON a.doc_id < b.doc_id
      |      WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
      |          / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.8),
      |e4 AS (SELECT u, v FROM p4 UNION SELECT v, u FROM p4),
      |reach(u, v) AS (SELECT u, u FROM (SELECT DISTINCT u FROM e4) t
      |                UNION SELECT r.u, ed.v FROM reach r JOIN e4 ed ON r.v = ed.u),
      |comp AS (SELECT u AS node, MIN(v) AS comp FROM reach GROUP BY u),
      |q4 AS MATERIALIZED (SELECT q3.* FROM q3 LEFT JOIN comp ON q3.doc_id = comp.node
      |       WHERE q3.doc_id = COALESCE(comp.comp, q3.doc_id)),
      |em AS (SELECT e.vec_id, e.embedding FROM embeddings e
      |       WHERE EXISTS (SELECT 1 FROM q4
      |                     WHERE e.vec_id = q4.doc_id % 100000)),
      |ctr AS (SELECT vec_id AS ctrid, embedding::DOUBLE[] AS c
      |        FROM em ORDER BY vec_id LIMIT 8),
      |asg AS (SELECT em.vec_id, em.embedding, c.ctrid,
      |          ROW_NUMBER() OVER (PARTITION BY em.vec_id
      |            ORDER BY list_cosine_similarity(em.embedding::DOUBLE[], c.c)
      |              DESC, c.ctrid) AS rk
      |        FROM em CROSS JOIN ctr c),
      |cell AS (SELECT vec_id, embedding, ctrid AS cell FROM asg WHERE rk = 1),
      |p5 AS (SELECT a.vec_id AS u, b.vec_id AS v
      |      FROM cell a JOIN cell b
      |        ON a.cell = b.cell AND a.vec_id < b.vec_id
      |      WHERE list_cosine_similarity(a.embedding::DOUBLE[],
      |              b.embedding::DOUBLE[]) >= 0.3),
      |e5 AS (SELECT u, v FROM p5 UNION SELECT v, u FROM p5),
      |reach5(u, v) AS (SELECT u, u FROM (SELECT DISTINCT u FROM e5) t
      |                 UNION SELECT r.u, ed.v FROM reach5 r JOIN e5 ed ON r.v = ed.u),
      |comp5 AS (SELECT u AS node, MIN(v) AS comp FROM reach5 GROUP BY u),
      |q5 AS MATERIALIZED (SELECT q4.* FROM q4
      |       JOIN cell ON cell.vec_id = q4.doc_id % 100000
      |       LEFT JOIN comp5 ON comp5.node = q4.doc_id % 100000
      |       WHERE q4.doc_id % 100000
      |             = COALESCE(comp5.comp, q4.doc_id % 100000)),
      |ge0 AS (SELECT doc_id, $ToksExpr AS toks FROM documents
      |        WHERE doc_id % 50 = 0),
      |ge AS (SELECT DISTINCT gram FROM (SELECT unnest(
      |         CASE WHEN len(toks) = 0 THEN []
      |              WHEN len(toks) < 4 THEN [array_to_string(toks, ' ')]
      |              ELSE [array_to_string(toks[i:i+3], ' ')
      |                    for i in range(1, len(toks) - 2)]
      |         END) AS gram FROM ge0)),
      |gt0 AS (SELECT doc_id, $ToksExpr AS toks FROM q5
      |        WHERE doc_id % 50 <> 0),
      |gc AS (SELECT DISTINCT doc_id, gram FROM (SELECT doc_id, unnest(
      |         CASE WHEN len(toks) = 0 THEN []
      |              WHEN len(toks) < 4 THEN [array_to_string(toks, ' ')]
      |              ELSE [array_to_string(toks[i:i+3], ' ')
      |                    for i in range(1, len(toks) - 2)]
      |         END) AS gram FROM gt0)),
      |tot AS (SELECT doc_id, COUNT(*) AS n FROM gc GROUP BY 1),
      |hit AS (SELECT gc.doc_id, COUNT(*) AS hh FROM gc JOIN ge USING (gram)
      |        GROUP BY 1),
      |q6 AS MATERIALIZED (SELECT q5.doc_id, q5.text, q5.lang, q5.source FROM q5
      |       LEFT JOIN tot ON tot.doc_id = q5.doc_id
      |       LEFT JOIN hit ON hit.doc_id = q5.doc_id
      |       WHERE q5.doc_id % 50 <> 0
      |         AND (CASE WHEN COALESCE(tot.n, 0) = 0 THEN 0.0
      |              ELSE COALESCE(hit.hh, 0)::DOUBLE / tot.n END) <= 0.05)"""
      .stripMargin

  /** q_ann_ivfpq_res's standalone replay: PqCte's quantized points +
    * the shared cell CTEs + the residual chain, top-5. */
  private lazy val IvfPqResOracle: String =
    s"""$PqCte,
       |$IvfCellCte,
       |$PqResCte
       |SELECT query_id, neighbor_id, adist, rank
       |FROM rres WHERE rank <= 5""".stripMargin

  private val q_salted_join: (SparkSession, String) => DataFrame =
    (s, dir) => {
      // maximal skew: 3 l_returnflag values over the whole lineitem table —
      // the shape where a plain shuffle join leaves 29 of 32 reducers idle
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"))
      val flagStats = li.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("flag_rows"))
      SaltedJoin(li, flagStats, on = Seq("l_returnflag"), salts = 32)
        .select(col("l_orderkey").as("okey"), col("l_linenumber").as("lnum"),
          col("l_returnflag").as("flag"), col("flag_rows"))
    }

  /** Bloom-pruned selective semi-join: lineitems of urgent high-value
    * orders. The bloom probe cuts lineitem BEFORE its shuffle (a pure
    * codegen'd projection filter — no broadcast relation build, no
    * shuffle); the exact semi join then removes the ≤fpp false positives,
    * so the result is exactly the plain semi join the oracle runs. */
  private val q_bloom_join: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      val hot = t(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT" &&
          col("o_totalprice") > 150000.0)
      graft.joins.BloomPrune
        .semiJoin(li, hot, "l_orderkey", "o_orderkey", fpp = 0.01)
        .groupBy(col("l_returnflag").as("flag"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
    }

  /** One-pass column profile of lineitem (null/distinct/min/max per
    * column, single aggregation job). */
  private val q_profile: (SparkSession, String) => DataFrame =
    (s, dir) =>
      graft.agg.Profile.columns(t(s, dir, "lineitem"),
        Seq("l_orderkey", "l_returnflag", "l_quantity"))

  /** Join-key skew diagnostic: the 10 heaviest supplier keys with their
    * row share — the number that picks plain join vs SaltedJoin. */
  private val q_skew: (SparkSession, String) => DataFrame =
    (s, dir) =>
      graft.agg.Profile.keySkew(t(s, dir, "lineitem"), "l_suppkey", k = 10)

  /** Grouped top-k: each priority class's 3 priciest orders (rank window
    * + WindowGroupLimit pruning — no group ever buffers more than k). */
  private val q_topk: (SparkSession, String) => DataFrame =
    (s, dir) =>
      graft.agg.TopK.perGroup(
        t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice")),
        groupBy = Seq("o_orderpriority"),
        order = Seq(col("o_totalprice").desc, col("o_orderkey").asc),
        k = 3, rankCol = "rnk")
      .withColumn("rnk", col("rnk").cast("long"))

  private val q_sample_stratified: (SparkSession, String) => DataFrame =
    (s, dir) =>
      graft.sample.Sampling.stratified(
        docs(s, dir).select(col("doc_id"), col("lang")),
        strata = Seq("lang"), idCol = "doc_id", n = 25, seed = 7L)

  /** Mixture rebalancing: sample documents to a 50/20/15/10/5 language
    * mix over a 200-row budget (quota = floor(total·w) per language). */
  private val q_sample_mixture: (SparkSession, String) => DataFrame =
    (s, dir) =>
      graft.sample.Sampling.mixture(
        docs(s, dir).select(col("doc_id"), col("lang")),
        strataCol = "lang", idCol = "doc_id",
        weights = Map("en" -> 0.5, "de" -> 0.2, "fr" -> 0.15,
          "es" -> 0.1, "zh" -> 0.05),
        total = 200L, seed = 7L)

  /** Temperature-scaled (α = 0.5) language rebalancing: quotas derive
    * from the corpus's own counts (count^α / Σ count^α), so the head
    * language shrinks relatively and the tails keep more of their rows.
    * Margin check: the quotas' fractional parts sit ≥ 0.24 from an
    * integer boundary at every gate scale, so the libm `pow` ulp caveat
    * on [[graft.sample.Sampling.temperature]] cannot flip a row.
    */
  private val q_sample_temperature: (SparkSession, String) => DataFrame =
    (s, dir) =>
      graft.sample.Sampling.temperature(
        docs(s, dir).select(col("doc_id"), col("lang")),
        strataCol = "lang", idCol = "doc_id",
        alpha = 0.5, total = 150L, seed = 11L)
        .select(col("lang"), col("doc_id"))

  /** Token-budget plan: 50k-char budget at 40/30/20/10 weights over four
    * sources, repetition capped at 2 epochs. */
  private val q_token_plan: (SparkSession, String) => DataFrame =
    (s, dir) =>
      graft.sample.TokenBudget.plan(docs(s, dir), "source", "n_chars",
        Map("src0" -> 0.4, "src1" -> 0.3, "src2" -> 0.2, "src3" -> 0.1),
        budget = 50000L, maxEpochs = 2.0)

  /** Budget-bounded sampling: keep docs per source in md5 order until
    * the char quota is crossed. */
  private val q_token_sample: (SparkSession, String) => DataFrame =
    (s, dir) =>
      graft.sample.TokenBudget.sampleToBudget(
        docs(s, dir).select(col("source"), col("doc_id"), col("n_chars")),
        "source", "doc_id", "n_chars",
        Map("src0" -> 5000L, "src1" -> 3000L), seed = 7L)

  /** DSIR importance resampling: the `doc_id % 7 == 0` slice plays the
    * in-domain target corpus, the rest is the raw pool; top 100 raw docs
    * by Gumbel-perturbed hashed-bigram importance weight. ln sums are
    * order-dependent floats → midpoint-nudge-rounded (cf. [[r6m]]); the
    * Gumbel keys themselves separate by far more than an ulp. */
  private val q_dsir: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), col("text"))
      val target = d.filter(col("doc_id") % 7 === 0)
      val raw = d.filter(col("doc_id") % 7 =!= 0)
      graft.sample.Dsir.resample(raw, target, "doc_id", "text",
        n = 100, seed = 42L, buckets = 2048, k = 1.0)
        .select(col("doc_id").as("did"), col("n_feats"),
          r6m(col("log_weight")).as("log_weight"))
    }

  /** Leakage-free split: bucket by CONTENT digest, not row id — exact
    * duplicates co-assign, so train and test can never share a text. */
  private val q_split_bykey: (SparkSession, String) => DataFrame =
    (s, dir) =>
      graft.sample.Sampling.assignSplit(
        docs(s, dir).withColumn("__graft_ck", md5(col("text"))),
        "__graft_ck", weights = Seq(0.8, 0.1, 0.1), seed = 7L)
        .select(col("doc_id"), col("split"))

  private val q_sample_split: (SparkSession, String) => DataFrame =
    (s, dir) =>
      // binary-exact weights: the cumulative bounds (0.75, 0.875) are the
      // same float64 literals the oracle SQL uses
      graft.sample.Sampling.assignSplit(
        docs(s, dir).select(col("doc_id")),
        idCol = "doc_id", weights = Seq(0.75, 0.125, 0.125), seed = 7L)

  private val q_top_tokens: (SparkSession, String) => DataFrame =
    (s, dir) =>
      VocabStats.topTokens(docs(s, dir), "text",
        groupBy = Seq("lang"), k = 10)

  /** Corpus-trained bigram-LM quality score per document (add-1
    * smoothing); ln noise handled by midpoint-nudged rounding. */
  private val q_lm_score: (SparkSession, String) => DataFrame =
    (s, dir) =>
      graft.text.NgramLm.scoreBigram(docs(s, dir), "doc_id", "text", k = 1.0)
        .select(col("doc_id").as("did"), col("n_bigrams"),
          r6m(col("avg_logprob")).as("avg_logprob"))

  /** Corpus collocations: top-50 adjacent-token pairs by PMI among
    * pairs seen >= 3 times; deterministic (pmi, w1, w2) boundary. */
  private val q_collocations: (SparkSession, String) => DataFrame =
    (s, dir) =>
      graft.text.Collocations(docs(s, dir), "text", minCount = 3L, topK = 50)
        .select(col("w1"), col("w2"), col("n_pair"),
          r6m(col("pmi")).as("pmi"))

  /** RAG-style character chunking: 120-char windows advancing by 100
    * (20-char overlap), tail window included. */
  private val q_text_chunks: (SparkSession, String) => DataFrame =
    (s, dir) =>
      graft.text.Chunker.chunk(
        docs(s, dir).select(col("doc_id"), col("text")), "text",
        size = 120, overlap = 20)
        .select(col("doc_id").as("did"), col("chunk_id"),
          col("chunk_start"), col("chunk"))

  /** BM25 scores of every document against the 8 most frequent corpus
    * tokens of length >= 4 (deterministic tie-break by token). */
  private val q_bm25: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val d = docs(s, dir)
      val terms = d.select(explode(Shingles.tokens(col("text"))).as("tok"))
        .where(length(col("tok")) >= 4)
        .groupBy("tok").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("tok")).limit(8)
        .select(col("tok").as("term"))
      Bm25(d, "doc_id", "text", terms)
        .select(col("term"), col("doc_id").as("did"), r6m(col("score")).as("score"))
    }

  /** TF-IDF keyword extraction: each document's top-3 terms among those
    * appearing in ≥5 documents, ranked by raw count (engine-portable
    * ties); smoothed-idf weights rounded through the midpoint nudge. */
  private val q_tfidf: (SparkSession, String) => DataFrame =
    (s, dir) =>
      graft.text.TfIdf(docs(s, dir), "doc_id", "text", minDf = 5L, topK = 3)
        .select(col("doc_id").as("did"), col("term"), col("tf"), col("df"),
          r6m(col("tfidf")).as("tfidf"))

  /** Incremental dedup: the odd-id half of the corpus ingested as a new
    * batch against the even-id half as the existing corpus — fresh rows
    * only, within-batch duplicates collapsed to their canonical row. */
  private val q_dedup_incr: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val d = docs(s, dir)
      val corpus = d.filter(col("doc_id") % 2 === 0)
      val batch = d.filter(col("doc_id") % 2 === 1)
      ExactDedup.incremental(batch, corpus, Seq("text"), "doc_id")
        .select(col("doc_id"), md5(col("text")).as("digest"))
    }

  /** Duplicate-span removal (Lee et al.-style substring dedup at 8-token
    * windows); md5 gram keys so DuckDB reproduces the spans bit-exactly.
    * Output digests the cleaned text rather than shipping it. */
  private val q_span_dedup: (SparkSession, String) => DataFrame =
    (s, dir) =>
      graft.text.SpanDedup(docs(s, dir), "doc_id", "text", n = 8,
        gramKey = Some(g => md5(g)))
        .select(col("doc_id").as("did"), md5(col("text")).as("digest"),
          col("n_tokens"), col("n_removed"))

  private val q_text_stats: (SparkSession, String) => DataFrame =
    (s, dir) =>
      TextStats(docs(s, dir), "text")
        .select(col("doc_id"), col("n_tokens"), col("punct_ratio"),
          col("stopword_ratio"), col("mean_token_len"))

  private val q_langid: (SparkSession, String) => DataFrame =
    (s, dir) =>
      LangId.assign(docs(s, dir), "text")
        .select(col("doc_id"), col("lang_guess"))

  /** Gopher-rules composite quality gate with thresholds tuned to give
    * the synthetic corpus mixed outcomes on the token rules; the
    * line-level rules (bullets, ellipses, symbols) are structurally
    * always-pass here — no newlines or punctuation in the corpus — and
    * are exercised by the PipelineSpecs fixture instead.
    */
  /** Deterministic 64-bucket linear model for q_lin_score: weights from
    * a Knuth-multiplicative ramp (pure integer arithmetic — identical
    * numbers inlined into the oracle SQL), fasttext-style token+bigram
    * features, fixed-point 1e-6. */
  private val LinModel = graft.text.LinearScorer.Model(
    (0 until 64).map(i => (i * 2654435761L) % 2001 - 1000),
    bias = 500L, seed = 11L)

  /** Hashed linear classifier inference over the corpus: exact integer
    * score per document + the keep gate — bit-identical to the oracle's
    * inlined-weight evaluation (zero float tolerance). */
  private val q_lin_score: (SparkSession, String) => DataFrame =
    (s, dir) =>
      graft.text.LinearScorer.score(
        docs(s, dir).select(col("doc_id"), col("text")), "text", LinModel)
        .select(col("doc_id").as("did"), col("n_feats"), col("score_fp"),
          (col("score_fp") > 0).as("keep"))

  /** Changelog → SCD2 validity intervals over the event log: each
    * user's events become half-open `[ts, next_ts)` validity windows,
    * event_id breaking timestamp ties, last event open-ended. */
  private val q_changelog: (SparkSession, String) => DataFrame =
    (s, dir) =>
      graft.intervals.ChangelogIntervals(
        t(s, dir, "events").select(col("user_id"), col("event_id"),
          col("ts"), col("event_type")),
        on = Seq("user_id"), tsCol = "ts", tieBreak = Seq("event_id"))
        .select(col("user_id"), col("event_id"), col("ts").as("start"),
          col("stop"), col("event_type"))

  /** Deterministic contrastive negative sampling: queries are every
    * 17th document, each paired with its xor-1 sibling as the positive;
    * 4 negatives per query drawn through the bucketed md5 rank-space
    * probe (16 slices, 12 probes) — exact engine-portable selection,
    * positives excluded, duplicate draws collapsed. */
  private val q_negatives: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val d = docs(s, dir)
      val pairs = d.filter(col("doc_id") % 17 === 3)
        .select(col("doc_id").as("qid"),
          expr("doc_id ^ CAST(1 AS BIGINT)").as("pos_id"))
      graft.sample.Negatives(pairs, d, "qid", "pos_id", "doc_id",
        k = 4, seed = 7L, buckets = 16, oversample = 8)
    }

  /** One-pass data-mixture report: (lang × source) cells, per-lang
    * subtotals, and the grand total via ROLLUP (single Expand plan, no
    * per-level re-scan), with share-of-corpus from a 1-row broadcast.
    * grouping_id bit-compatibility with ANSI GROUPING is part of what
    * the oracle checks. */
  private val q_mixture: (SparkSession, String) => DataFrame =
    (s, dir) =>
      graft.agg.MixtureReport(docs(s, dir), Seq("lang", "source"), "n_chars")
        .select(col("lang"), col("source"), col("level").cast("long").as("level"),
          col("n_docs"), col("weight").cast("long").as("weight"),
          r6m(col("doc_share")).as("doc_share"),
          r6m(col("weight_share")).as("weight_share"))

  /** Curation-funnel attrition report ([[graft.core.Funnel]]): one
    * corpus pass attributes every document to the first gate it fails
    * (language → token floor → char floor → source blocklist) and
    * emits the per-stage entering/failed/surviving table — the
    * removal-rate report public curation pipelines publish
    * (Gopher/RefinedWeb-style), as a first-class oracle-checked
    * result. Predicates are row-local by design (join-shaped gates
    * belong in the pipeline; see the Funnel scaladoc).
    */
  private val q_funnel: (SparkSession, String) => DataFrame =
    (s, dir) =>
      graft.core.Funnel(docs(s, dir), Seq(
        "lang_en"    -> (col("lang") === "en"),
        "min_tokens" -> (size(graft.text.Shingles.tokens(col("text"))) >= 30),
        "min_chars"  -> (length(col("text")) >= 150),
        "src_ok"     -> (col("source") =!= "src0")))

  /** The funnel over the REAL pipeline — q_pipeline5's six row-dropping
    * stages as the gates. These gates are join-shaped (dedup
    * canonicality, blocklist anti-joins, decontamination), exactly the
    * case the [[graft.core.Funnel]] scaladoc defers to precomputed flag
    * columns: each stage's surviving id set becomes a left-joined flag
    * on the input corpus, and the funnel's one-scan first-fail
    * attribution runs over the flags. Because each stage's survivors
    * are a subset of the previous stage's, the first null flag IS the
    * first failed gate. The oracle re-aggregates the SAME stage CTEs
    * q_pipeline5's oracle replays — agreement pins both the memberships
    * and the attrition arithmetic. Note: the `decontamination` stage
    * also drops the eval holdout rows (doc_id % 50 = 0), matching the
    * pipeline itself. */
  private val q_funnel_pipeline: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val (d0, stages) = pipeline5Stages(s, dir)
      val flagged = stages.zipWithIndex.foldLeft(
        d0.select(col("doc_id"))) { case (acc, ((_, df), i)) =>
          acc.join(df.select(col("doc_id"), lit(true).as(s"__f$i")),
            Seq("doc_id"), "left")
        }
      graft.core.Funnel(flagged, stages.zipWithIndex.map {
        case ((name, _), i) => name -> col(s"__f$i")
      })
    }

  /** The STREAMING funnel as a driver query, executed in batch (the
    * q_contamination_perrow / q_dedup_simhash_stream move):
    * [[graft.streaming.StreamingOps.streamingFunnel]] is a stateless
    * first-fail projection under a watermarked windowed count, so the
    * identical plan runs bounded here. Event time is REAL this round —
    * the events table's `ts` column (the sessionize input), not a
    * synthetic stamp derived from an id: out-of-order arrival under
    * the watermark is the property a streaming funnel exists for, and
    * the MemoryStream spec (FunnelSpec) feeds late-but-inside-watermark
    * rows against it. Gates are event-shaped (error quarantine →
    * engagement → value floor), 1-day windows over the fixture's 30
    * days. The oracle replays the epoch-floor window bucketing, the
    * gate CASE, and the counts. */
  private val q_funnel_stream: (SparkSession, String) => DataFrame =
    (s, dir) =>
      graft.streaming.StreamingOps.streamingFunnel(
        // parquet timestamps read back NTZ; the UTC session makes the
        // LTZ cast wall-time-preserving, so win_start.cast(long) is the
        // same epoch-second DuckDB's epoch(ts) computes
        t(s, dir, "events").withColumn("ts", col("ts").cast("timestamp")),
        "ts", Seq(
          "not_error" -> (col("event_type") =!= "error"),
          "engaged"   -> col("event_type").isin("click", "purchase", "signup"),
          "valued"    -> (col("value") >= 10.0)),
        watermark = "1 hour", windowDur = "1 day")
        .select(col("win_start").cast("long").as("win_start"),
          col("stage_idx"), col("stage"), col("rows").as("n_rows"))

  private val q_quality_gate: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val t = QualityFilter.GopherThresholds(
        minTokens = 30, maxTokens = 90, minMeanLen = 3.0, maxMeanLen = 4.3,
        minStopwords = 2)
      QualityFilter.gopher(docs(s, dir), "text", t)
        .select(col("doc_id"), col("n_tokens"), col("mean_token_len"),
          col("symbol_ratio"), col("alpha_frac"), col("n_stopwords"),
          col("r_n_tokens"), col("r_mean_token_len"), col("r_symbol_ratio"),
          col("r_alpha_frac"), col("r_n_stopwords"),
          col("passes"), col("reason"))
    }

  /** Gopher-style repetition quality signals (token + top-2-gram level;
    * the corpus has no newlines, so the line-level signals are covered by
    * unit specs instead).
    */
  private val q_text_repetition: (SparkSession, String) => DataFrame =
    (s, dir) =>
      graft.text.Repetition.signals(docs(s, dir), "doc_id", "text", n = 2)

  /** Train/eval contamination: every 50th document plays the eval set;
    * 3-grams (the small word-soup vocabulary makes classic 8-grams all
    * unique — no signal to check). Gram keys are md5-derived so DuckDB
    * reproduces them bit-for-bit (xxhash64 is Spark-specific).
    */
  private val q_contamination: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val d = docs(s, dir)
      graft.text.Contamination.check(
        d.filter(col("doc_id") % 50 =!= 0),
        d.filter(col("doc_id") % 50 === 0),
        "doc_id", "text", n = 3,
        gramKey = Some(g =>
          conv(substring(md5(g.cast("binary")), 1, 15), 16, 10).cast("long")))
    }

  /** The zero-state STREAMING decontamination gate executed in batch:
    * [[graft.text.Contamination.perRow]] is a pure projection (in-row
    * gram hashes merge-intersected against the broadcast eval-key
    * array), so the identical plan serves `readStream` unchanged — this
    * row puts it under the driver's DuckDB gate alongside its
    * MemoryStream spec. The oracle recomputes the counts from raw gram
    * STRINGS (no hashes), so agreement also witnesses that the 64-bit
    * gram hashing is collision-free on this corpus.
    */
  private val q_contamination_perrow: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val d = docs(s, dir)
      val keys = graft.text.Contamination.evalGramKeys(
        d.filter(col("doc_id") % 50 === 0), "text", n = 3)
      graft.text.Contamination.perRow(
        d.filter(col("doc_id") % 50 =!= 0), "text", keys, n = 3)
        .select(col("doc_id"), col("n_grams"), col("n_contaminated"),
          col("contamination_frac"))
    }

  /** The streaming sessionizer executed in batch:
    * [[graft.streaming.StreamingOps.sessionize]] is a pure
    * `session_window` plan (withWatermark is a no-op on bounded input),
    * so the same code path the MemoryStream spec drives incrementally is
    * here checked against a gaps-and-islands DuckDB oracle. The float
    * session sum rounds on both sides (summation-order noise).
    */
  private val q_sessionize: (SparkSession, String) => DataFrame =
    (s, dir) =>
      graft.streaming.StreamingOps.sessionize(
        t(s, dir, "events").select(col("ts"), col("user_id"), col("value")),
        "ts", "user_id", "value", gap = "30 minutes",
        watermark = "0 seconds")
        .select(col("user_id"), col("session_start"), col("session_stop"),
          col("n_events"), r6(col("v_sum")).as("v_sum"))

  /** GPT-style sequence packing: documents in doc_id order concatenated
    * and cut into 128-token packs; one row per (doc × pack) overlap.
    */
  private val q_packing: (SparkSession, String) => DataFrame =
    (s, dir) =>
      graft.text.Packing.chunk(
        t(s, dir, "documents")
          .select(col("doc_id"),
            size(graft.text.Shingles.tokens(col("text"))).as("n")),
        Seq(col("doc_id")), col("n"), budget = 128L)
        .select(col("doc_id"), col("pack_id"),
          col("off_start"), col("off_end"), col("pack_off"))

  /** PII scrub over deterministically synthesized addresses (the corpus
    * itself is PII-free word soup). Counts cast to long — DuckDB's
    * `len()` is BIGINT and the driver compares dtypes.
    */
  private val q_text_scrub: (SparkSession, String) => DataFrame =
    (s, dir) =>
      graft.text.Scrub(
        docs(s, dir).select(col("doc_id"),
          concat(col("text"),
            when(col("doc_id") % 7 === 0, lit(" ping user7@example.com"))
              .otherwise(lit("")),
            when(col("doc_id") % 11 === 0, lit(" at https://data.example.org/x?y=1"))
              .otherwise(lit("")),
            when(col("doc_id") % 13 === 0, lit(" from 192.168.0.7"))
              .otherwise(lit(""))).as("text")),
        "text")
        .select(col("doc_id"),
          col("n_email").cast("long").as("n_email"),
          col("n_url").cast("long").as("n_url"),
          col("n_ipv4").cast("long").as("n_ipv4"),
          col("scrubbed"))

  /** URL canonicalization over deterministically synthesized crawl URLs
    * (the corpus has no url column): scheme/host case, fragments,
    * default ports, tracking params, root-slash — plus host and
    * registrable-domain extraction. String-exact DuckDB oracle.
    */
  private val q_url_normalize: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val id = col("doc_id")
      val url = concat(
        when(id % 3 === 0, lit("HTTP://")).when(id % 3 === 1, lit("https://"))
          .otherwise(lit("http://")),
        when(id % 4 === 0, lit("WWW.News")).when(id % 4 === 1, lit("blog.Site"))
          .when(id % 4 === 2, lit("cdn.media")).otherwise(lit("Docs.Portal")),
        when(id % 5 === 0, lit(".com")).when(id % 5 === 1, lit(".co.uk"))
          .when(id % 5 === 2, lit(".org")).when(id % 5 === 3, lit(".com.au"))
          .otherwise(lit(".io")),
        when(id % 7 === 0, lit(":80")).when(id % 7 === 1, lit(":443"))
          .when(id % 7 === 2, lit(":8080")).otherwise(lit("")),
        when(id % 11 === 0, lit("/"))
          .otherwise(concat(lit("/p/"), id.cast("string"))),
        when(id % 2 === 0,
          concat(lit("?utm_source=x&id="), id.cast("string"),
            lit("&utm_medium=y")))
          .when(id % 13 === 0, lit("?utm_campaign=z")).otherwise(lit("")),
        when(id % 6 === 0, lit("#sec2")).otherwise(lit("")))
      val d = docs(s, dir).select(id, url.as("url"))
      val h = graft.text.UrlOps.host(col("url"))
      d.select(col("doc_id"),
        graft.text.UrlOps.normalize(col("url")).as("url_norm"),
        h.as("host"),
        graft.text.UrlOps.registrableDomain(h).as("domain"))
    }

  /** Unicode-script detection over deterministically mixed-script text
    * (the corpus is ASCII word soup, so script snippets are appended by
    * doc_id residue). Counts + main_script, string-exact DuckDB oracle.
    */
  private val q_script_id: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val id = col("doc_id")
      val mixed = docs(s, dir).select(id, concat(col("text"),
        when(id % 4 === 1, lit(" Привет мир")).otherwise(lit("")),
        when(id % 4 === 2, lit(" 你好 世界 こんにちは 안녕")).otherwise(lit("")),
        when(id % 4 === 3, lit(" مرحبا بالعالم")).otherwise(lit("")),
        when(id % 5 === 0, lit(" αβγδ 42")).otherwise(lit(""))).as("t"))
      graft.text.ScriptId(mixed, "t")
        .select(col("doc_id"),
          col("n_latin").cast("long").as("n_latin"),
          col("n_cyrillic").cast("long").as("n_cyrillic"),
          col("n_greek").cast("long").as("n_greek"),
          col("n_arabic").cast("long").as("n_arabic"),
          col("n_cjk").cast("long").as("n_cjk"),
          col("n_digit").cast("long").as("n_digit"),
          col("main_script"))
    }

  /** HTML → visible-text extraction over deterministically synthesized
    * markup (the corpus is plain text, so pages are built around it by
    * doc_id residue: script/style blocks, comments, entities, anchors).
    * String-exact DuckDB oracle; ratio is one division — bit-exact.
    */
  private val q_html_extract: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val id = col("doc_id")
      val page = concat(
        lit("<!DOCTYPE html><html><head>"),
        when(id % 3 =!= 0,
          concat(lit("<title> Doc "), id.cast("string"),
            lit(" &amp; more </title>"))).otherwise(lit("")),
        when(id % 4 === 0,
          lit("<style> body { color: red; } </style>")).otherwise(lit("")),
        lit("</head><body>"),
        when(id % 5 === 0,
          lit("<script type=\"text/javascript\">var x = 1 < 2 && y > 3;</script>"))
          .otherwise(lit("")),
        lit("<!-- nav\nboilerplate --><div class=\"main\"><p>"),
        substring(col("text"), 1, 120),
        lit("</p><br>"),
        when(id % 2 === 0,
          lit("<a href=\"/x\">Link</a> &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;end"))
          .otherwise(lit("")),
        when(id % 7 === 0,
          lit("<a href=\"/y\">More</a><A HREF=\"/z\">CAPS</A>"))
          .otherwise(lit("")),
        lit("</div></body></html>"))
      docs(s, dir).select(id, page.as("html"))
        .select(col("doc_id"),
          graft.text.HtmlExtract.title(col("html")).as("title"),
          graft.text.HtmlExtract.text(col("html")).as("body_text"),
          graft.text.HtmlExtract.linkCount(col("html")).as("n_links"),
          graft.text.HtmlExtract.textRatio(col("html")).as("text_ratio"))
    }

  /** Link-graph authority over a deterministic synthetic multigraph on
    * the document ids (the corpus has no link column): each doc links to
    * (2·id+1) mod N unless id%7=0 and to (3·id+7) mod N unless id%3=0,
    * so hubs, dangling nodes (id%21=0) and self-loops all occur. Ranks
    * are integer fixed-point — the oracle reproduces every division
    * exactly with `//`, no float tolerance anywhere. */
  private val q_pagerank: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val d = docs(s, dir).select(col("doc_id"))
      val n = d.count() // driver scalar: the synthetic graph's modulus
      val e1 = d.filter(col("doc_id") % 7 =!= 0)
        .select(col("doc_id").as("src"),
          ((col("doc_id") * 2 + 1) % n).as("dst"))
      val e2 = d.filter(col("doc_id") % 3 =!= 0)
        .select(col("doc_id").as("src"),
          ((col("doc_id") * 3 + 7) % n).as("dst"))
      graft.graph.PageRank(e1.unionByName(e2), "src", "dst",
        iterations = 5, nodes = Some(d))
        .select(col("node"), col("rank").as("rank_fp"))
    }

  /** Shared oracle CTE chain for q_bpe / q_bpe_merges: 3 unrolled BPE
    * rounds (see graft.text.Bpe). Round r: weighted adjacent-pair
    * counts over v{r-1}, winner by (count DESC, a, b) — then the greedy
    * left-to-right merge replayed EXACTLY via the parity-window rule:
    * candidate positions grouped into consecutive runs, even offsets
    * from each run start merge (equivalent to the operator's fold —
    * overlaps only arise for a==b runs). Ends with v3 (word, freq,
    * syms) and top1..top3. Zero tolerance: strings + integers only. */
  /** Shared closure oracle for q_dedup_anchor / q_dedup_anchor2: the
    * transitive closure of the EXACT 3-gram Jaccard pair set — both
    * pairing modes must reproduce the same clusters (anchor2's pair
    * list is a superset of anchor's, a subset of all-pairs, and all
    * three closures coincide on a mutually-matching corpus). */
  private lazy val AnchorClosureSql: String =
    s"""WITH RECURSIVE
      |dd AS (SELECT doc_id, $ToksExpr AS tk FROM documents),
      |g AS (SELECT doc_id, list_distinct(
      |        [list_aggregate(tk[i:i+2], 'string_agg', ' ')
      |         FOR i IN range(1, greatest(len(tk) - 2, 1) + 1)]) AS sh FROM dd),
      |p AS (SELECT a.doc_id AS u, b.doc_id AS v
      |      FROM g a JOIN g b ON a.doc_id < b.doc_id
      |      WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
      |          / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.8),
      |e AS (SELECT u, v FROM p UNION SELECT v, u FROM p),
      |reach(u, v) AS (SELECT u, u FROM (SELECT DISTINCT u FROM e) t
      |                UNION SELECT r.u, ed.v FROM reach r JOIN e ed ON r.v = ed.u),
      |comp AS (SELECT u AS node, MIN(v) AS comp FROM reach GROUP BY u),
      |lab AS (SELECT doc.doc_id AS did, COALESCE(c.comp, doc.doc_id) AS cid
      |        FROM documents doc LEFT JOIN comp c ON doc.doc_id = c.node)
      |SELECT did, cid, COUNT(*) OVER (PARTITION BY cid) AS sz,
      |       CAST(did = cid AS INT) AS canon
      |FROM lab""".stripMargin

  // lazy: references ToksExpr, which is declared later in the file
  private lazy val BpeCte: String = bpeCteFrom("documents")

  /** The unrolled 3-round BPE training replay, parameterized by the
    * words' source CTE/table (`src` must expose a `text` column) — the
    * pipeline chain trains its tokenizer on the CURATED corpus, not the
    * raw table. */
  private def bpeCteFrom(src: String): String = {
    val rounds = (1 to 3).map { r =>
      val p = s"v${r - 1}"
      s"""px$r AS (SELECT word, freq, syms,
         |    unnest(range(1, len(syms))) AS i FROM $p),
         |pc$r AS (SELECT syms[i] AS a, syms[i + 1] AS b, sum(freq) AS c
         |  FROM px$r GROUP BY 1, 2),
         |top$r AS (SELECT a, b FROM pc$r ORDER BY c DESC, a, b LIMIT 1),
         |cand$r AS (SELECT px.word, px.i FROM px$r px JOIN top$r t
         |  ON px.syms[px.i] = t.a AND px.syms[px.i + 1] = t.b),
         |runs$r AS (SELECT word, i,
         |    i - row_number() OVER (PARTITION BY word ORDER BY i) AS g
         |  FROM cand$r),
         |keep$r AS (SELECT word, i FROM (
         |    SELECT word, i, min(i) OVER (PARTITION BY word, g) AS g0
         |    FROM runs$r) WHERE (i - g0) % 2 = 0),
         |pos$r AS (SELECT word, freq, syms,
         |    unnest(range(1, len(syms) + 1)) AS j FROM $p),
         |v$r AS (SELECT p.word, p.freq,
         |    list(CASE WHEN k1.i IS NOT NULL
         |           THEN p.syms[p.j] || p.syms[p.j + 1]
         |           ELSE p.syms[p.j] END ORDER BY p.j) AS syms
         |  FROM pos$r p
         |  LEFT JOIN keep$r k1 ON k1.word = p.word AND k1.i = p.j
         |  LEFT JOIN keep$r k2 ON k2.word = p.word AND k2.i = p.j - 1
         |  WHERE k2.i IS NULL
         |  GROUP BY 1, 2)""".stripMargin
    }.mkString(",\n")
    s"""WITH wd AS (SELECT unnest($ToksExpr) AS word FROM $src),
       |wc AS (SELECT word, count(*)::BIGINT AS freq FROM wd GROUP BY 1),
       |v0 AS (SELECT word, freq,
       |    [word[i] FOR i IN range(1, len(word) + 1)] || ['</w>'] AS syms
       |  FROM wc),
       |$rounds""".stripMargin
  }

  /** The synthesized crawl URL keyed by doc id (the corpus has no url
    * column) — shared by q_url_blocklist and the q_pipeline5 chain so
    * both replay against the oracle's one `syn` CTE. */
  private def synUrl(id: Column): Column = concat(
    when(id % 3 === 0, lit("HTTP://")).when(id % 3 === 1, lit("https://"))
      .otherwise(lit("http://")),
    when(id % 4 === 0, lit("WWW.News")).when(id % 4 === 1, lit("blog.Site"))
      .when(id % 4 === 2, lit("cdn.media")).otherwise(lit("Docs.Portal")),
    when(id % 5 === 0, lit(".com")).when(id % 5 === 1, lit(".co.uk"))
      .when(id % 5 === 2, lit(".org")).when(id % 5 === 3, lit(".com.au"))
      .otherwise(lit(".io")),
    when(id % 11 === 0, lit("/"))
      .otherwise(concat(lit("/p/"), id.cast("string"))))

  /** Blocklist gate over the synthesized crawl URLs (q_url_normalize's
    * generator): "site.co.uk" blocks every blog.site.co.uk subdomain
    * via the registrable domain, "cdn.media.org" blocks that exact
    * host, "news.com" takes the www. family — survivors keep their
    * doc_id + host. */
  private val q_url_blocklist: (SparkSession, String) => DataFrame =
    (s, dir) => {
      import s.implicits._
      val d = docs(s, dir)
        .select(col("doc_id"), synUrl(col("doc_id")).as("url"))
      val blocked = Seq("site.co.uk", "cdn.media.org", "news.com")
        .toDF("entry")
      graft.text.UrlFilter(d, "url", blocked, "entry")
        .select(col("doc_id"),
          graft.text.UrlOps.host(col("url")).as("host"))
    }

  /** Morton z-values over (user_id, event time µs) at 16 bits/dim —
    * the multi-dimensional layout key, exact integer construction
    * (bucket-width normalization + shift/or interleave) replayed
    * bit-for-bit by the oracle. */
  private val q_zorder: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val ev = t(s, dir, "events").select(col("event_id"), col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"))
      graft.sources.ZOrder.withZValue(ev, Seq("user_id", "us"), bits = 16)
        .select(col("event_id"), col("z"))
    }

  /** Corpus word-frequency table for the BPE trainer — ToksExpr's exact
    * Spark mirror (lowercased whitespace tokens). */
  private def bpeWords(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(explode(graft.text.Shingles.tokens(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** BPE merge training, 3 rounds: the final symbolized vocab — every
    * word's symbol sequence after the 3 learned merges, bit-exact vs
    * the oracle's unrolled parity-window replay of the same greedy
    * left-to-right rule. */
  private val q_bpe: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val (_, vocab) = graft.text.Bpe.fit(bpeWords(s, dir), "word", "freq",
        k = 3)
      vocab.select(col("word"), col("freq").as("n"),
        array_join(col("symbols"), " ").as("syms"))
    }

  /** The learned merge table itself (rank-ordered, deterministic ties
    * → lexicographic pair). */
  private val q_bpe_merges: (SparkSession, String) => DataFrame =
    (s, dir) => {
      import s.implicits._
      val (merges, _) = graft.text.Bpe.fit(bpeWords(s, dir), "word", "freq",
        k = 3)
      merges.map(m => (m.rank.toLong, m.left, m.right))
        .toDF("merge_rank", "sym_a", "sym_b")
    }

  /** BPE ENCODE over the corpus with the 3 learned merges — the step a
    * 100 TB pipeline actually runs hot (training is once per tokenizer;
    * encoding touches every byte). Oracle: every word's final symbol
    * sequence is the trained vocab's v3 row, so encoding = tokens
    * joined to v3 and re-concatenated in position order. */
  private val q_bpe_encode: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val (merges, _) = graft.text.Bpe.fit(bpeWords(s, dir), "word", "freq",
        k = 3)
      graft.text.Bpe.encode(docs(s, dir), "text", merges)
        .select(col("doc_id"), array_join(col("bpe_symbols"), " ").as("syms"))
    }

  /** The PRODUCTION tokenize path end-to-end: BPE training (3 rounds,
    * driver-side merge table — once per tokenizer) → trained symbols
    * baked into a WordPiece piece vocabulary
    * ([[graft.text.Bpe.toWordPieceVocab]]) → the native codegen'd
    * greedy longest-match expression encodes the corpus — the route
    * that scales to a 30k-merge vocabulary where `Bpe.encode`'s
    * per-merge fold chain (capped at 64) cannot. Oracle: the same
    * trained-piece derivation on DuckDB's unrolled BPE CTE, then the
    * q_wordpiece recursive greedy walk over those pieces. */
  private val q_bpe_wordpiece: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val (_, vocab) = graft.text.Bpe.fit(bpeWords(s, dir), "word", "freq",
        k = 3)
      val pieces = graft.text.Bpe.toWordPieceVocab(vocab)
      val toks = graft.text.WordPiece.tokens(col("text"), pieces)
      docs(s, dir).select(col("doc_id"), toks.as("toks"))
        .select(col("doc_id"),
          array_join(col("toks"), " ").as("tokens_str"),
          size(col("toks")).cast("long").as("n_tokens"),
          size(filter(col("toks"), t => t === "[UNK]"))
            .cast("long").as("n_unk"))
    }

  /** The salted sweep on a deliberately skewed shape: one key holds
    * half of BOTH sides (the mega-entity), the rest spread over ~1000
    * keys; the hot key is time-sliced 8 ways so its sweep runs on 8
    * tasks instead of 1 (keep=first bounds output to one row per
    * matched left row at every scale). Oracle: plain range join +
    * min-by — the slicing must be invisible in the result. */
  private val q_salted_sweep: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val skew = (k: Column) => when(k % 2 === 0, 0L).otherwise(k % 997)
      val l = t(s, dir, "orders").select(
        col("o_orderkey").as("okey"), skew(col("o_orderkey")).as("grp"),
        ((col("o_orderkey") * 13 % 100000).cast("double") / 10.0).as("s"),
        ((col("o_orderkey") * 13 % 100000).cast("double") / 10.0 +
          (col("o_custkey") % 40).cast("double") / 10.0).as("e"))
      val r = t(s, dir, "orders").select(
        col("o_orderkey").as("rid"), skew(col("o_orderkey")).as("grp_r"),
        ((col("o_orderkey") * 31 % 100000).cast("double") / 10.0).as("p"))
      graft.joins.SaltedSweepJoin(l, r, Seq("grp"), Seq("grp_r"),
        IntervalSpec.closed("s", "e"), IntervalSpec.point("p"),
        slices = 8, hotKeyThreshold = 300,
        keep = "first", rightOrderCol = Some("rid"))
        .select(col("okey"), col("rid"))
    }

  /** Stats-driven skew routing: [[graft.joins.SaltedSweepJoin.auto]]
    * with NO manual threshold/slices/side — one both-sides stats pass
    * detects the hot keys, derives the slice count from the hottest
    * key, and (the shape here) picks RIGHT-side slicing because the
    * mega-key is lineitem-heavy (4 line items per order: the right
    * side carries ~4× the hot rows). `targetRowsPerTask` is pinned to
    * test-scale task sizing only because sf0.01 is far below the
    * production floor (`minHotRows` = 64 Ki rows/key) — the derivation
    * itself (2 · total/parallelism) is what `graft.SkewProbe`
    * exercises at probe scale. Shares the plain range-join oracle:
    * salting must be row-invisible. */
  private val q_auto_sweep: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val skew = (k: Column) => when(k % 2 === 0, 0L).otherwise(k % 997)
      val l = t(s, dir, "orders").select(
        col("o_orderkey").as("okey"), skew(col("o_orderkey")).as("grp"),
        ((col("o_orderkey") * 13 % 100000).cast("double") / 10.0).as("s"),
        ((col("o_orderkey") * 13 % 100000).cast("double") / 10.0 +
          (col("o_custkey") % 40).cast("double") / 10.0).as("e"))
      val r = t(s, dir, "lineitem").select(
        (col("l_orderkey") * 10 + col("l_linenumber")).as("rid"),
        skew(col("l_orderkey")).as("grp_r"),
        ((col("l_orderkey") * 31 % 100000).cast("double") / 10.0 +
          col("l_linenumber").cast("double")).as("p"))
      graft.joins.SaltedSweepJoin.auto(l, r, Seq("grp"), Seq("grp_r"),
        IntervalSpec.closed("s", "e"), IntervalSpec.point("p"),
        targetRowsPerTask = 300)
        .groupBy(col("okey"))
        .agg(count(lit(1)).as("n_matches"), min(col("rid")).as("min_rid"))
    }

  /** The [[graft.plans.SweepJoinRewrite]] auto-salt routing end-to-end
    * on the SKEWED shape: a PLAIN declarative DataFrame range join — no
    * graft operator call, no salting hint — on a session with the rule
    * installed and `autoSalt` at its default (true). The rule rewrites
    * to the deferred dispatch node, whose execution-time stats pass
    * detects the mega-key and time-slices it via
    * [[graft.joins.SaltedSweepJoin.auto]] — the user wrote `df.join`,
    * the optimizer owns the skew strategy. Shares q_auto_sweep's
    * oracle: routing must be row-invisible. `newSession` isolates the
    * conf/optimizer state. */
  private val q_rule_auto_sweep: (SparkSession, String) => DataFrame =
    (s0, dir) => {
      val s = s0.newSession()
      s.experimental.extraOptimizations = Seq(graft.plans.SweepJoinRewrite)
      s.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .experimental.extraStrategies =
          Seq(org.apache.spark.sql.graft.IntervalSweepStrategy)
      s.conf.set(graft.plans.SweepJoinRewrite.enabledKey, "true")
      // test-scale task sizing only (production floor is 64Ki rows/key);
      // the derivation itself is what graft.SkewProbe exercises at scale
      s.conf.set("spark.graft.skew.targetRowsPerTask", "300")
      val skew = (k: Column) => when(k % 2 === 0, 0L).otherwise(k % 997)
      val l = t(s, dir, "orders").select(
        col("o_orderkey").as("okey"), skew(col("o_orderkey")).as("grp"),
        ((col("o_orderkey") * 13 % 100000).cast("double") / 10.0).as("s"),
        ((col("o_orderkey") * 13 % 100000).cast("double") / 10.0 +
          (col("o_custkey") % 40).cast("double") / 10.0).as("e"))
      val r = t(s, dir, "lineitem").select(
        (col("l_orderkey") * 10 + col("l_linenumber")).as("rid"),
        skew(col("l_orderkey")).as("grp_r"),
        ((col("l_orderkey") * 31 % 100000).cast("double") / 10.0 +
          col("l_linenumber").cast("double")).as("p"))
      l.join(r, col("grp") === col("grp_r") &&
          col("p") >= col("s") && col("p") <= col("e"))
        .groupBy(col("okey"))
        .agg(count(lit(1)).as("n_matches"), min(col("rid")).as("min_rid"))
    }

  /** q_auto_sweep AND q_rule_auto_sweep replay to the same plain range
    * join: salting/routing must be row-invisible. */
  private val AutoSweepOracle: String =
    """WITH l AS (SELECT o_orderkey AS okey,
      |             CASE WHEN o_orderkey % 2 = 0 THEN 0
      |                  ELSE o_orderkey % 997 END AS grp,
      |             (o_orderkey * 13 % 100000) / 10.0 AS s,
      |             (o_orderkey * 13 % 100000) / 10.0
      |               + (o_custkey % 40) / 10.0 AS e
      |           FROM orders),
      |r AS (SELECT l_orderkey * 10 + l_linenumber AS rid,
      |        CASE WHEN l_orderkey % 2 = 0 THEN 0
      |             ELSE l_orderkey % 997 END AS grp,
      |        (l_orderkey * 31 % 100000) / 10.0 + l_linenumber AS p
      |      FROM lineitem)
      |SELECT l.okey, COUNT(*) AS n_matches, MIN(r.rid) AS min_rid
      |FROM l JOIN r ON l.grp = r.grp AND r.p >= l.s AND r.p <= l.e
      |GROUP BY l.okey""".stripMargin

  /** Synchronous label propagation over the q_pagerank synthetic graph:
    * seed labels doc_id % 50, 3 rounds of in-neighbor majority with
    * ties to the smallest label — bit-exact vs 3 unrolled rounds in
    * SQL (the graph-family determinism contract: components = hard
    * clusters, PageRank = authority, LPA = communities). */
  private val q_labelprop: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val d = docs(s, dir).select(col("doc_id"))
      val n = d.count()
      val e1 = d.filter(col("doc_id") % 7 =!= 0)
        .select(col("doc_id").as("src"),
          ((col("doc_id") * 2 + 1) % n).as("dst"))
      val e2 = d.filter(col("doc_id") % 3 =!= 0)
        .select(col("doc_id").as("src"),
          ((col("doc_id") * 3 + 7) % n).as("dst"))
      graft.graph.LabelPropagation(
        d.select(col("doc_id").as("node"),
          (col("doc_id") % 50).as("label")),
        e1.unionByName(e2), iters = 3)
    }

  /** WordPiece vocabulary for q_wordpiece — hand-built against the
    * corpus word pool to exercise every algorithm branch: whole-word
    * hits, 2- and 3-piece splits, greedy-longest ("custom" must beat
    * "cust"), and greedy DEAD ENDS ("grou"+X where only "gro"+"##up"
    * would complete → whole word [UNK], the no-backtracking contract).
    * The oracle consumes the same Seq, so the two can never drift. */
  private val WpVocab: Seq[String] = Seq(
    "a", "the", "data", "key", "row", "join", "hash", "scan", "sort",
    "agg", "big", "slow", "fast", "line", "part", "merge", "spark", "sp",
    "custom", "cust", "##er", "col", "##umn", "f", "##il", "##ter",
    "vec", "##tor", "win", "##dow", "str", "##eam", "tab", "##le",
    "val", "##ue", "bat", "##ch", "sm", "##all", "que", "##ry",
    "or", "##der", "grou", "gro", "##up")

  /** Subword tokenization of the corpus under the fixed vocabulary:
    * the native greedy longest-match expression vs a recursive-CTE
    * DuckDB oracle that replays the same greedy walk piece by piece —
    * string-exact, data-independent (any word tokenizes or UNKs
    * identically on both engines). */
  private val q_wordpiece: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val toks = graft.text.WordPiece.tokens(col("text"), WpVocab)
      docs(s, dir).select(col("doc_id"), toks.as("toks"))
        .select(col("doc_id"),
          array_join(col("toks"), " ").as("tokens_str"),
          size(col("toks")).cast("long").as("n_tokens"),
          size(filter(col("toks"), t => t === "[UNK]"))
            .cast("long").as("n_unk"))
    }

  private val q_text_fingerprint: (SparkSession, String) => DataFrame =
    (s, dir) =>
      Fingerprint(docs(s, dir), "text",
        hashFn = c => md5(c.cast("binary")),
        digestFn = c => md5(concat_ws(",", c).cast("binary")))
        .select(col("doc_id"), size(col("fingerprints")).cast("long").as("n_fp"),
          col("digest"))

  private val q_media_frames: (SparkSession, String) => DataFrame =
    (s, dir) =>
      Media.sampleFrames(Media.fromDocuments(s, docs(s, dir)).toDF(), stride = 4)
        .groupBy(col("media_id"), col("kind"))
        .agg(count(lit(1)).as("n_sampled"))

  /** Real decode end-to-end: payloads are encoded as genuine PNG / PCM /
    * framed-PNG bytes from known pixel formulas, decoded back through
    * `javax.imageio` / byte parsing, and the oracle recomputes the
    * decoded band-mean features arithmetically — a wrong decode fails
    * the hash compare. `n_bytes` is excluded (PNG length is
    * encoder-dependent); the decoded dimensions are checked instead.
    */
  private val q_media_features: (SparkSession, String) => DataFrame =
    (s, dir) =>
      Media.extractFeatures(Media.fromDocuments(s, docs(s, dir)), dim = 16)
        .toDF()
        .select(col("media_id"), col("kind"),
          col("dec_width").cast("long").as("dec_width"),
          col("dec_height").cast("long").as("dec_height"),
          r6m(element_at(col("features"), 1).cast("double")).as("f0"))

  /** Perceptual near-dup over MEDIA — the missing link between the
    * decode plumbing (q_media_features) and the dedup family: groups of
    * five re-encoded brightness-jittered copies of each base image
    * ([[Media.nearDupImages]] — pairwise-distinct BYTES, so exact dedup
    * finds nothing) are recovered through the classic 8×8 average-hash:
    * decoded integer luminance grid → 64-bit fingerprint (cell mean >
    * global mean, an exact integer cross-multiplication — no float
    * threshold, so DuckDB replays it with zero tolerance) → the SimHash
    * pigeonhole machinery over the fingerprint
    * ([[SimHashDedup.fromFingerprints]], Hamming ≤ 2). The oracle
    * recomputes the decoded pixels arithmetically (the
    * q_media_features formula + the jitter clamp), the fingerprints,
    * and the full pair set. Scale: decode is the batched mapPartitions
    * scan, blocking is pigeonhole-exact (never a cartesian), buckets
    * count-first bounded. */
  private val q_media_dedup: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val media = Media.nearDupImages(s, docs(s, dir))
      val grid = Media.extractLumGrid(media, gw = 8, gh = 8).toDF()
        .filter(size(col("lum")) > 0)
        // project the total ONCE (interpreted HOF lambdas re-evaluate
        // non-column references per element)
        .select(col("media_id").as("id"), col("lum"),
          aggregate(col("lum"), lit(0L), (a, x) => a + x).as("total"))
      val fp = grid.select(col("id"),
        aggregate(
          zip_with(col("lum"), sequence(lit(0), size(col("lum")) - 1),
            (x, j) => when(x * size(col("lum")) > col("total"),
              call_function("shiftleft", lit(1L), j.cast("int")))
              .otherwise(lit(0L))),
          lit(0L), (a, b) => a.bitwiseOR(b)).as("fp"))
      SimHashDedup.fromFingerprints(fp, "fp", "id",
        maxHamming = 2, fpBits = 64)
        .select(col("id_l"), col("id_r"), col("hamming"))
    }

  /** DCT pHash beside aHash — the perceptual family completed for the
    * jitter aHash is brittle under: groups of five CONTRAST-jittered
    * copies (integer gains ±25%, [[Media.contrastDupImages]]; gains > 1
    * clamp the bright tail — a NON-uniform distortion). Measured on
    * this fixture (`graft.MediaHashProbe`, cross-base minimum taken
    * over EVERY gain×gain replica pair): planted-pair aHash Hamming
    * reaches 8 while distinct bases come as close as 2 — NO aHash
    * threshold separates; pHash (sign-of-DCT-coefficient over the same
    * integer grid, exact Long arithmetic against the quantized
    * [[Media.DctTable]] basis) keeps planted pairs ≤ 5 with distinct
    * bases ≥ 6 — threshold 5 recovers every planted pair with zero
    * false positives, which is exactly what this query's oracle pins
    * (pixel formulas → integer gains → DCT with the embedded basis
    * literals → sign bits → full Hamming join). Blocking is the same
    * pigeonhole machinery (6 blocks over 63 bits at Hamming ≤ 5). */
  private val q_media_phash: (SparkSession, String) => DataFrame =
    (s, dir) => {
      import s.implicits._
      val media = Media.contrastDupImages(s, docs(s, dir))
      val fp = media.mapPartitions { it =>
        it.grouped(Media.BatchSize).flatMap(_.flatMap(m =>
          Media.pHash64(m.kind, m.content).map(h => (m.media_id, h))))
      }.toDF("id", "fp")
      SimHashDedup.fromFingerprints(fp, "fp", "id",
        maxHamming = 5, fpBits = 63)
        .select(col("id_l"), col("id_r"), col("hamming"))
    }

  /** VIDEO near-dup — the perceptual family extended to the third media
    * kind the fixture carries: groups of five re-encoded
    * brightness-jittered replicas of each base clip
    * ([[Media.nearDupVideos]] — pairwise-distinct BYTES, per-frame
    * jitter, so exact dedup finds nothing) are recovered through
    * per-frame DCT pHash → pigeonhole-blocked frame pairs → exact
    * MIN-over-frame-pairs Hamming per clip pair
    * ([[graft.multimodal.VideoDedup]]). Threshold 5 from
    * [[graft.VideoHashProbe]]: planted pairs reach min-Hamming 4 while
    * foreign clips stay ≥ 7 — a clean margin, with 45% of planted
    * pairs at nonzero distance (exact fingerprint dedup would miss
    * them). The oracle replays frames → jittered pixels → normalized
    * cell means → DCT sign bits → quadratic min-Hamming. */
  private val q_media_video_dedup: (SparkSession, String) => DataFrame =
    (s, dir) =>
      graft.multimodal.VideoDedup(
        Media.nearDupVideos(s, docs(s, dir)), maxHamming = 5)
        .select(col("id_l"), col("id_r"), col("min_hamming"))

  /** The streaming VIDEO gate executed in batch
    * ([[graft.streaming.StreamingOps.streamingVideoDedup]]): stateless
    * decode → per-frame pHash → sorted-fingerprint md5 digest, then
    * keyed first arrival. Event time is monotone in media_id, so
    * first-arrival == min(media_id) per digest — what the oracle
    * computes from the arithmetic frame replay (md5 over the
    * comma-joined sorted BIGINT fingerprints is engine-portable).
    * Exact perceptual equality only; min-Hamming near-dup is the
    * batch operator's job (q_media_video_dedup). */
  private val q_media_video_stream: (SparkSession, String) => DataFrame =
    (s, dir) =>
      graft.streaming.StreamingOps.streamingVideoDedup(
        Media.nearDupVideos(s, docs(s, dir)).toDF()
          .withColumn("ts", timestamp_seconds(col("media_id"))),
        "ts", watermark = "1 hour")
        .select(col("media_id").as("did"), col("vdigest"))

  /** The streaming media gate executed in batch:
    * [[graft.streaming.StreamingOps.streamingMediaDedup]] is a
    * stateless decode+fingerprint stage plus a keyed first-arrival
    * selection, so the identical code path runs bounded here (the
    * MemoryStream spec drives it incrementally). Event time is
    * synthesized monotonically from media_id, so streaming
    * first-arrival == min(media_id) per aHash — exactly what the
    * DuckDB oracle computes from the arithmetic pixel replay. */
  private val q_media_dedup_stream: (SparkSession, String) => DataFrame =
    (s, dir) =>
      graft.streaming.StreamingOps.streamingMediaDedup(
        Media.nearDupImages(s, docs(s, dir)).toDF()
          .withColumn("ts", timestamp_seconds(col("media_id"))),
        "ts", watermark = "1 hour")
        .select(col("media_id").as("did"), col("ahash").as("ah"))

  /** AUDIO near-dup — the perceptual family completed for the last
    * media kind the fixture carries: groups of five amplitude-gain
    * replicas of each base clip ([[Media.nearDupAudio]] — integer
    * gains ±25%, pairwise-distinct BYTES, so exact dedup finds
    * nothing) are recovered through the 63-bit envelope band-sign
    * fingerprint ([[Media.audioFingerprint]]: |amplitude| envelope
    * bins → per-bin fixed-point mean → exact Long DCT signs) and the
    * pigeonhole pair search ([[graft.multimodal.AudioDedup]]).
    * Threshold 5 from [[graft.AudioHashProbe]]: planted pairs stay
    * ≤ 1 while foreign clips stay ≥ 16 over every gain×gain pair at
    * 400 bases — a wide margin. The oracle replays samples → envelope
    * hash → bin means → DCT sign bits → full Hamming join. */
  private val q_audio_dedup: (SparkSession, String) => DataFrame =
    (s, dir) =>
      graft.multimodal.AudioDedup(
        Media.nearDupAudio(s, docs(s, dir)), maxHamming = 5)
        .select(col("id_l"), col("id_r"), col("hamming"))

  /** The streaming AUDIO gate executed in batch
    * ([[graft.streaming.StreamingOps.streamingAudioDedup]]): stateless
    * PCM decode → envelope fingerprint, then keyed first arrival.
    * Event time is monotone in media_id, so first-arrival ==
    * min(media_id) per fingerprint — what the oracle computes from the
    * arithmetic sample replay. Exact perceptual equality only;
    * Hamming-ball near-dup is the batch operator's job
    * (q_audio_dedup). */
  private val q_audio_dedup_stream: (SparkSession, String) => DataFrame =
    (s, dir) =>
      graft.streaming.StreamingOps.streamingAudioDedup(
        Media.nearDupAudio(s, docs(s, dir)).toDF()
          .withColumn("ts", timestamp_seconds(col("media_id"))),
        "ts", watermark = "1 hour")
        .select(col("media_id").as("did"), col("afp"))

  /** MULTIMODAL curation chain — the perceptual media gate composed
    * INTO a text-curation funnel the way a real pretraining pipeline
    * runs them (the 8-stage text chain is already pinned end-to-end by
    * q_pipeline5; this query proves the media operators participate in
    * the same attrition accounting instead of living beside it):
    * ingest → token-count quality gate → exact text dedup → ONE
    * perceptual media gate spanning all three kinds (image aHash ≤ 2
    * over [[Media.nearDupImages]], audio envelope ≤ 5 over
    * [[Media.nearDupAudio]], video min-Hamming ≤ 5 over
    * [[Media.nearDupVideos]] — every document carries a media payload
    * by fixture construction, kind = doc_id mod 3). The media drop
    * rule is pairwise first-wins (a doc is dropped iff it is the
    * LARGER id of some within-survivor near-dup pair) — well-defined
    * without transitive closure, and the pair sets are computed
    * strictly WITHIN the text-gate survivors (drop a doc at stage 1
    * and its media can no longer shadow a later replica — real
    * pipeline semantics). Output is the funnel table itself: one row
    * per stage plus one ATTRIBUTION row per media kind, so the oracle
    * pins both the survivor arithmetic and which kind dropped what. */
  private val q_pipeline6: (SparkSession, String) => DataFrame =
    (s, dir) => {
      import s.implicits._
      val d0 = docs(s, dir).select(col("doc_id"), col("text"))
      val q1 = d0
        .filter(size(Shingles.tokens(col("text"))).between(12, 1000))
        .localCheckpoint(false)
      val q2 = ExactDedup.survivors(q1, Seq("text"), "doc_id")
        .localCheckpoint(false)
      val imgFp = Media.nearDupImages(s, q2).mapPartitions { it =>
        it.grouped(Media.BatchSize).flatMap(_.flatMap(m =>
          Media.aHash64(m.kind, m.content).map(h => (m.media_id, h))))
      }.toDF("id", "fp")
      val imgDrop = SimHashDedup.fromFingerprints(imgFp, "fp", "id",
          maxHamming = 2, fpBits = 64)
        .select(col("id_r")).distinct().localCheckpoint(false)
      val audDrop = graft.multimodal.AudioDedup(
          Media.nearDupAudio(s, q2), maxHamming = 5)
        .select(col("id_r")).distinct().localCheckpoint(false)
      val vidDrop = graft.multimodal.VideoDedup(
          Media.nearDupVideos(s, q2), maxHamming = 5)
        .select(col("id_r")).distinct().localCheckpoint(false)
      val drops = imgDrop.union(audDrop).union(vidDrop).distinct()
      val q3 = q2.join(drops, q2("doc_id") === drops("id_r"), "left_anti")
      def row(stage: String, df: DataFrame) =
        df.agg(count(lit(1)).cast("long").as("n"))
          .select(lit(stage).as("stage"), col("n"))
      row("0_ingest", d0)
        .unionByName(row("1_quality", q1))
        .unionByName(row("2_exact_dedup", q2))
        .unionByName(row("3_media_gate", q3))
        .unionByName(row("3_drop_image", imgDrop))
        .unionByName(row("3_drop_audio", audDrop))
        .unionByName(row("3_drop_video", vidDrop))
    }

  // ───────── baseline-shape throughput probes (BASELINE.md rows 1, 5) ──
  //
  // The reference's only published numbers are a 10M×1M equality+
  // containment join (5.47 s) and equality+overlap join (9.73 s) over 10k
  // int groups with float64 endpoints. These two queries reproduce that
  // workload SHAPE deterministically from the orders table (×66 / ×7 row
  // replication → 9.9M × 1.05M at sf0.1, 10k groups, integer-derived
  // float endpoints, ~1.5M / ~11M output rows) and run it through the
  // real IntervalJoin operator, so the bench line is directly comparable
  // to the baseline wall-clock at the same scale.

  private def benchLeft(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"),
        explode(sequence(lit(0), lit(65))).as("i"))
      .select(
        ((col("o_orderkey") * 7919 + col("i")) % 10000).as("grp"),
        (((col("o_orderkey") * 13 + col("i") * 7) % 100000).cast("double")
          / 10.0).as("s"),
        (((col("o_custkey") + col("i")) % 300).cast("double") / 10.0).as("len"))
      .select(col("grp"), col("s"), (col("s") + col("len")).as("e"))

  private def benchRight(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"),
        explode(sequence(lit(0), lit(6))).as("i"))
      .select(
        ((col("o_orderkey") * 104729 + col("i")) % 10000).as("grp"),
        (((col("o_orderkey") * 31 + col("i") * 17) % 100000).cast("double")
          / 10.0).as("p"),
        (((col("o_custkey") * 3 + col("i")) % 1100).cast("double") / 10.0).as("len"))

  // Executed via the binned rewrite: the naive plan (BHJ on grp + range
  // post-filter) evaluates 10k groups × 990×105 = 1e9 candidate pairs
  // (~77 s at local[32]); binning on (grp, ⌊x/w⌋) prunes candidates to
  // ~|output| and beats the reference's published single-node numbers
  // (best-of-2 at sf0.1: ~4.5 s vs 5.47 s contain, ~4.3-4.8 s vs 9.73 s
  // overlap). Widths re-swept round 6 (interleaved passes, 5-pass
  // medians): contain optimum moved to 100 {50:4.33, 100:3.77,
  // 150:5.74} — the r3 optimum of 50 was tuned on a quieter host and
  // its median had drifted to ~7 s by the r5 driver bench. Overlap
  // (r3 sweep): optimum ~75-100 {50:7.8, 75:7.2, 100:7.2, 200:8.3,
  // 400:9.4} — the rewrite is the big win; the width and the
  // shuffle_hash hints (serial broadcast build → parallel shuffled
  // build) buy the rest. A caller without sweep data should pass
  // autoBinWidth = true (sampled median length: ~15 contain / ~55
  // overlap here — inside the sweep's flat region); the probes pin the
  // measured optimum so the baseline comparison stays knob-stable.
  // The baseline probes run through the SWEEP exec (round 6) — the
  // fastest engine path for this inner/keep=both shape: one shuffle +
  // one sort per side, partition-local sweep, no bin-width knob, no
  // candidate explosion. Measured at sf0.1 best-of-3 on a quiet host:
  // overlap 3.3 s (binned 5.8 s, reference 9.73 s), contain 4.5 s
  // (binned 4.2 s, reference 5.47 s) — and the sweep's medians hold
  // steadier because there is nothing to mistune. The binned path stays
  // benched + oracle-checked as q_binned_contain / q_binned_overlap.
  private val q_bench_contain: (SparkSession, String) => DataFrame =
    (s, dir) =>
      graft.joins.SweepJoin(
        benchLeft(s, dir),
        benchRight(s, dir).select(col("grp").as("grp_r"), col("p")),
        Seq("grp"), Seq("grp_r"),
        leftSpec = IntervalSpec.closed("s", "e"),
        rightSpec = IntervalSpec.point("p"))
        .select(col("grp"), col("s"), col("p"))

  private val q_bench_overlap: (SparkSession, String) => DataFrame =
    (s, dir) =>
      graft.joins.SweepJoin(
        benchLeft(s, dir),
        benchRight(s, dir)
          .select(col("grp").as("grp_r"), col("p").as("rs"),
            (col("p") + col("len")).as("re")),
        Seq("grp"), Seq("grp_r"),
        leftSpec = IntervalSpec.closed("s", "e"),
        rightSpec = IntervalSpec.closed("rs", "re"))
        .select(col("grp"), col("s"), col("rs"))

  private val q_binned_contain: (SparkSession, String) => DataFrame =
    (s, dir) =>
      IntervalJoin(
        benchLeft(s, dir),
        benchRight(s, dir).select(col("grp"), col("p")).hint("shuffle_hash"),
        leftSpec  = IntervalSpec.closed("s", "e"),
        rightSpec = IntervalSpec.point("p"),
        leftOn = Seq("grp"), rightOn = Seq("grp"),
        keepOrder = false, binWidth = Some(100.0))
        .select(col("grp_x").as("grp"), col("s"), col("p"))

  private val q_binned_overlap: (SparkSession, String) => DataFrame =
    (s, dir) =>
      IntervalJoin(
        benchLeft(s, dir),
        benchRight(s, dir)
          .select(col("grp"), col("p").as("rs"), (col("p") + col("len")).as("re"))
          // shuffle_hash beats the default broadcast here (7.3 s → 5.6 s):
          // the exploded build side is ~1.4M rows, and a broadcast builds
          // that hash relation ON ONE THREAD while 32 cores idle — the
          // shuffled build is parallel. (Same lesson at cluster scale:
          // broadcasting is for sides that are small, not just fit.)
          .hint("shuffle_hash"),
        leftSpec  = IntervalSpec.closed("s", "e"),
        rightSpec = IntervalSpec.closed("rs", "re"),
        leftOn = Seq("grp"), rightOn = Seq("grp"),
        keepOrder = false, binWidth = Some(100.0))
        .select(col("grp_x").as("grp"), col("s"), col("rs"))

  /** The [[graft.plans.BinnedJoinRewrite]] optimizer rule end-to-end: a
    * PLAIN DataFrame range join — no graft operator call — on a session
    * with the rule installed. Spark alone plans this keyless overlap as a
    * cartesian/BNLJ; the rule turns it into the binned equi-join, and the
    * oracle checks the rows are untouched. Runs in a `newSession` so the
    * width conf and the extra optimization cannot leak into other queries
    * (sessions share the SparkContext but have isolated conf/optimizer
    * state).
    */
  private val q_rule_binned: (SparkSession, String) => DataFrame =
    (s0, dir) => {
      val s = s0.newSession()
      s.experimental.extraOptimizations = Seq(graft.plans.BinnedJoinRewrite)
      s.conf.set(graft.plans.BinnedJoinRewrite.widthKey, "300")
      val o = t(s, dir, "orders")
      val l = o.filter(col("o_orderkey") % 20 === 0).select(
        (col("o_orderkey") * 13 % 100000).as("s"),
        (col("o_orderkey") * 13 % 100000 + col("o_custkey") % 300).as("e"))
      val r = o.filter(col("o_orderkey") % 97 === 0).select(
        (col("o_orderkey") * 31 % 100000).as("rs"),
        (col("o_orderkey") * 31 % 100000 + col("o_custkey") % 500).as("re"))
      l.join(r, col("s") <= col("re") && col("rs") <= col("e"))
    }

  /** The [[graft.plans.SweepJoinRewrite]] optimizer rule end-to-end: a
    * PLAIN keyed DataFrame range join — no graft operator call — on a
    * session with the rule + planner strategy installed. Spark alone
    * would plan the coarse-keyed shape as a shuffled join with the range
    * as post-filter (per-key candidate cartesian); the rule plans it as
    * the custom sweep exec, and the oracle checks the rows are
    * untouched. `newSession` isolates the conf/optimizer state.
    */
  private val q_rule_sweep: (SparkSession, String) => DataFrame =
    (s0, dir) => {
      val s = s0.newSession()
      s.experimental.extraOptimizations = Seq(graft.plans.SweepJoinRewrite)
      s.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .experimental.extraStrategies =
          Seq(org.apache.spark.sql.graft.IntervalSweepStrategy)
      s.conf.set(graft.plans.SweepJoinRewrite.enabledKey, "true")
      val o = t(s, dir, "orders")
      val l = o.filter(col("o_orderkey") % 20 === 0).select(
        (col("o_custkey") % 40).as("g"),
        (col("o_orderkey") * 13 % 100000).as("s"),
        (col("o_orderkey") * 13 % 100000 + col("o_custkey") % 300).as("e"))
      val r = o.filter(col("o_orderkey") % 7 === 0).select(
        (col("o_custkey") % 40).as("g2"),
        (col("o_orderkey") * 31 % 100000).as("rs"),
        (col("o_orderkey") * 31 % 100000 + col("o_custkey") % 500).as("re"))
      l.join(r, col("g") === col("g2") &&
          col("s") <= col("re") && col("rs") <= col("e"))
        .select(col("g"), col("s"), col("rs"))
    }

  /** C4-style corpus line-dedup: drop "lines" occurring in ≥ 78% of
    * documents, reassemble survivors in order. This corpus has no
    * newlines, so the demo delimiter is the token separator; real
    * corpora pass "\n" (specs cover that). The scalar `count()` mirrors
    * the oracle's `ceil(0.78 * COUNT(*))` in the same IEEE arithmetic.
    */
  private val q_line_dedup: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), col("text"))
      val minDocs = math.ceil(0.78 * d.count()).toInt
      graft.text.LineDedup(d, "doc_id", "text",
        delimiter = " ", minDocs = minDocs)
        .select(col("doc_id").as("did"), col("text").as("kept_text"),
          col("n_lines"), col("n_removed"))
    }

  /** Trailing 1-hour event-time rolling aggregates per user. The frame
    * is value-based (range), so equal timestamps agree on their result
    * in both engines regardless of tie order. */
  private val q_rolling: (SparkSession, String) => DataFrame =
    (s, dir) =>
      graft.windows.Rolling.timeWindow(
        t(s, dir, "events"), Seq("user_id"), "ts", "value",
        window = 3600L * 1000000L,
        aggs = Seq("count", "sum", "mean", "min", "max"))
        .select(col("event_id").as("eid"), col("roll_count"),
          r6m(col("roll_sum")).as("roll_sum"),
          r6m(col("roll_mean")).as("roll_mean"),
          col("roll_min"), col("roll_max"))

  /** Positional rolling (pandas rolling(window=5, min_periods=3)) per
    * user over a deterministic total order (ts, event_id). */
  private val q_rolling_rows: (SparkSession, String) => DataFrame =
    (s, dir) =>
      graft.windows.Rolling.rowWindow(
        t(s, dir, "events"), Seq("user_id"), Seq("ts", "event_id"),
        "value", k = 5, aggs = Seq("count", "sum", "mean"), minPeriods = 3)
        .select(col("event_id").as("eid"), col("roll_count"),
          r6m(col("roll_sum")).as("roll_sum"),
          r6m(col("roll_mean")).as("roll_mean"))

  /** Schema-on-read JSON payload extraction (events.props) + a pushed
    * filter on the extracted field. */
  private val q_json_extract: (SparkSession, String) => DataFrame =
    (s, dir) => {
      import org.apache.spark.sql.types.{LongType, StructField, StructType}
      graft.sources.SemiStructured.extractJson(
        t(s, dir, "events"), "props", StructType(Seq(StructField("k", LongType))))
        .filter(col("k") >= 50)
        .select(col("event_id").as("eid"), col("event_type"), col("k"))
    }

  /** Per-returnflag winsorization of extended price at [p05, p95]. */
  private val q_winsorize: (SparkSession, String) => DataFrame =
    (s, dir) =>
      Winsorize(t(s, dir, "lineitem"), "l_extendedprice", Seq("l_returnflag"),
        lower = 0.05, upper = 0.95)
        .select(col("l_orderkey").as("okey"), col("l_linenumber").as("lnum"),
          r6m(col("l_extendedprice_w")).as("vw"),
          r6m(col("w_lo")).as("lo"), r6m(col("w_hi")).as("hi"))

  /** Second end-to-end curation chain, composed ENTIRELY of this round's
    * operators: line-level dedup → token stats of the deduped text →
    * per-language percent-rank normalization → quality-threshold filter
    * → per-(lang, source) corpus stats. Oracle-checked as a whole. */
  private val q_pipeline2: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), col("text"),
        col("lang"), col("source"))
      val minDocs = math.ceil(0.78 * d.count()).toInt
      val deduped = graft.text.LineDedup(d, "doc_id", "text",
        delimiter = " ", minDocs = minDocs)
        .withColumn("ntok",
          size(Shingles.tokens(col("text"))).cast("long"))
      val ranked = graft.agg.Normalize(deduped, "ntok", Seq("lang"), Seq("rank"))
      ranked.filter(col("ntok_rank") >= 0.25)
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("n"), r6m(avg(col("ntok"))).as("avg_ntok"))
    }

  /** Weight-proportional sample (Efraimidis–Spirakis) of 50 docs, longer
    * docs favored by n_chars. Key uses ln, whose last-ulp can differ
    * between libm implementations — but keys are spread over ~1e-1 gaps
    * at this k, so selection is engine-stable (same argument as the
    * cosine-threshold oracles). */
  private val q_sample_weighted: (SparkSession, String) => DataFrame =
    (s, dir) =>
      graft.sample.Sampling.weighted(
        docs(s, dir).select(col("doc_id"), col("n_chars")),
        idCol = "doc_id", weightCol = "n_chars", k = 50, seed = 7L)
        .select(col("doc_id").as("did"), col("n_chars"))

  /** Partitioned-layout sink round-trip: write lineitem hive-partitioned
    * by returnflag + sorted by shipdate, read it back with a partition
    * predicate (pruned at listing time — see LayoutSpec's PartitionFilters
    * audit), aggregate per month. The oracle reads the ORIGINAL table:
    * equality proves the layout round-trip is lossless. */
  private val q_layout_scan: (SparkSession, String) => DataFrame =
    (s, dir) => {
      // applicationId in the path: two concurrent runs over the same
      // dataset dir must not overwrite each other mid-read-back (and
      // abs(Int.MinValue) stays negative — hex, not abs)
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_layout_" +
        s"${s.sparkContext.applicationId}_${Integer.toHexString(dir.hashCode)}"
      graft.sources.Layout.writePartitioned(
        t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"), col("l_shipdate")),
        path, partitionBy = Seq("l_returnflag"), sortBy = Seq("l_shipdate"))
      graft.sources.Layout.read(s, path)
        .filter(col("l_returnflag") === "R")
        .groupBy(date_trunc("month", col("l_shipdate")).as("m"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))
    }

  /** CSV sink/source round-trip on the events table (timestamps,
    * doubles, and a free-text props column that exercises quoting):
    * write headered CSV, read it back with the EXPLICIT schema, compare
    * against the original parquet via the oracle — equality proves the
    * text round-trip is lossless, including the microsecond timestamps.
    */
  private val q_csv_roundtrip: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_csv_" +
        s"${s.sparkContext.applicationId}_${Integer.toHexString(dir.hashCode)}"
      val ev = t(s, dir, "events")
      graft.sources.Csv.write(ev, path)
      val back = graft.sources.Csv.read(s, path,
        ev.schema)
      back.filter(col("_corrupt_record").isNull)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"), col("props"))
    }

  /** ORC sink/source round-trip on the events table: write zstd ORC
    * with a bloom filter on user_id, read it back through the native
    * vectorized reader, compare against the original parquet via the
    * oracle — equality proves the cross-format round-trip is lossless
    * (timestamps, doubles, free text). A selective predicate keeps the
    * scan honest: OrcSpec audits PushedFilters on this exact shape. */
  private val q_orc_roundtrip: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_orc_" +
        s"${s.sparkContext.applicationId}_${Integer.toHexString(dir.hashCode)}"
      val ev = t(s, dir, "events")
      graft.sources.Orc.write(ev, path, bloomFor = Seq("user_id"))
      graft.sources.Orc.read(s, path)
        .filter(col("event_type") =!= "click")
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"), col("props"))
    }

  /** Interval anti-join: events outside every same-user error blackout
    * hour (time-range decontamination). Spark alone would plan the
    * NOT-EXISTS range condition as a nested-loop anti join. */
  private val q_interval_anti: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val ev = t(s, dir, "events")
      val blackouts = ev.filter(col("event_type") === "error")
        .select(col("user_id").as("b_uid"), col("ts").as("b_start"),
          (col("ts") + expr("INTERVAL 1 HOUR")).as("b_stop"))
      graft.joins.IntervalAntiJoin(
        ev.select(col("event_id"), col("user_id"), col("ts")), blackouts,
        leftSpec  = IntervalSpec.point("ts"),
        rightSpec = IntervalSpec.closed("b_start", "b_stop"),
        leftOn = Seq("user_id"), rightOn = Seq("b_uid"))
        .select(col("event_id").as("eid"))
    }

  /** Edit-distance join: each sampled part name against a deterministic
    * one-char perturbation of the sample (position-4 'X' substitution) —
    * every row gains a distance-1 partner; near-identical part names add
    * cross matches. Exact output (q-gram prefix blocking + bounded
    * levenshtein verify); oracle = brute-force levenshtein over the same
    * subsets, so blocking completeness is checked, not assumed. */
  private val q_fuzzy_join: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val base = t(s, dir, "part").filter(col("p_partkey") % 50 === 0)
      val lefts = base.select(col("p_partkey").as("lid"),
        col("p_name").as("lname"))
      val rights = base.select(
        (col("p_partkey") + 1000000000L).as("rid"),
        concat(substring(col("p_name"), 1, 3), lit("X"),
          substring(col("p_name"), 5, 1000000)).as("rname"))
      graft.joins.FuzzyJoin(lefts, rights, "lid", "lname", "rid", "rname",
        maxDistance = 1)
    }

  /** Same workload through the rarest-first frequency order (the
    * Zipf-skew scale switch) — identical brute-force oracle, so both
    * blocking orders are proven complete. */
  private val q_fuzzy_freq: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val base = t(s, dir, "part").filter(col("p_partkey") % 50 === 0)
      val lefts = base.select(col("p_partkey").as("lid"),
        col("p_name").as("lname"))
      val rights = base.select(
        (col("p_partkey") + 1000000000L).as("rid"),
        concat(substring(col("p_name"), 1, 3), lit("X"),
          substring(col("p_name"), 5, 1000000)).as("rname"))
      graft.joins.FuzzyJoin(lefts, rights, "lid", "lname", "rid", "rname",
        maxDistance = 1, frequencyOrder = true)
    }

  /** Two-frame interval subtraction: each order's 30-day window minus
    * the 7-day blackout after every shipment of that order — per-key
    * union of the rights, then maximal uncovered pieces of each left,
    * half-open `[start, stop)`. Exercises merged touching rights, full
    * deletions, and untouched windows on real referential keys. */
  private val q_interval_subtract: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val wins = t(s, dir, "orders").select(
        col("o_orderkey").as("okey"),
        col("o_orderdate").as("start"),
        (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("stop"))
      val blackouts = t(s, dir, "lineitem").select(
        col("l_orderkey").as("okey"),
        col("l_shipdate").as("start"),
        (col("l_shipdate") + expr("INTERVAL 7 DAYS")).as("stop"))
      graft.intervals.SubtractIntervals(
        wins, blackouts, on = Seq("okey"), leftIdCol = Some("okey"))
    }

  /** The dual of q_interval_subtract through [[graft.intervals
    * .IntersectIntervals]]: each order's 30-day window CLIPPED to the
    * union of the 7-day post-shipment windows — covered time instead of
    * uncovered time. Exercises the clamp on both edges, merged touching
    * rights, and inner semantics (orders with no shipments emit
    * nothing). */
  private val q_interval_intersect: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val wins = t(s, dir, "orders").select(
        col("o_orderkey").as("okey"),
        col("o_orderdate").as("start"),
        (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("stop"))
      val covered = t(s, dir, "lineitem").select(
        col("l_orderkey").as("okey"),
        col("l_shipdate").as("start"),
        (col("l_shipdate") + expr("INTERVAL 7 DAYS")).as("stop"))
      graft.intervals.IntersectIntervals(
        wins, covered, on = Seq("okey"))
    }

  /** End-to-end chain over the new subtraction op: each user's activity
    * span minus the 1-hour blackout after every error event → per-user
    * clean-uptime segment count and exact microsecond duration. The
    * whole chain (grouped span build → union of blackouts → carving →
    * re-aggregation) is oracle-checked as one unit. */
  private val q_pipeline3: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val ev = t(s, dir, "events")
      val wins = ev.groupBy("user_id")
        .agg(min(col("ts")).as("start"), max(col("ts")).as("stop"))
      val blackouts = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts").as("start"),
          (col("ts") + expr("INTERVAL 1 HOUR")).as("stop"))
      graft.intervals.SubtractIntervals(
        wins, blackouts, on = Seq("user_id"), leftIdCol = Some("user_id"))
        .groupBy(col("user_id").as("uid"))
        .agg(count(lit(1)).as("n_segments"),
          // events.ts is TIMESTAMP_NTZ; the UTC session makes the cast
          // agree with DuckDB's epoch_us over naive timestamps
          sum(unix_micros(col("stop").cast("timestamp")) -
              unix_micros(col("start").cast("timestamp"))).as("clean_us"))
    }

  /** Normalization before dedup: the corpus text is already clean, so
    * the query DIRTIES it deterministically (case, tabs, a control
    * char, trailing runs) and checks the cleaner canonicalizes it. */
  private val q_text_clean: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val messy = concat(
        upper(substring(col("text"), 1, 30)), lit("\t \u0001"),
        substring(col("text"), 31, 1000000), lit("  "))
      docs(s, dir)
        .select(col("doc_id").as("did"),
          graft.text.TextClean.clean(messy).as("clean_text"))
    }

  /** The deterministic hash cut for q_sample_hash: floor(0.2·2^60)
    * computed in DOUBLE on both engines (the oracle inlines this value —
    * a DECIMAL 0.2 in SQL would floor to a different integer). */
  private val HashCut: Long = math.floor(0.2 * (1L << 60).toDouble).toLong

  /** Stateless Bernoulli-by-hash sample (the streaming-safe sampler). */
  private val q_sample_hash: (SparkSession, String) => DataFrame =
    (s, dir) =>
      graft.sample.Sampling.hashFilter(
        docs(s, dir).select(col("doc_id")), "doc_id", p = 0.2, seed = 5L)
        .select(col("doc_id").as("did"))

  /** Inverted index over the corpus: exact document frequency, postings
    * capped at 100 (every token here exceeds the cap — the truncation
    * path is the one exercised), compared by posting-digest. */
  private val q_inverted: (SparkSession, String) => DataFrame =
    (s, dir) =>
      graft.text.InvertedIndex.build(docs(s, dir), "doc_id", "text",
        minDf = 2L, maxPostings = 100)
        .select(col("token"), col("df"),
          md5(concat_ws(",", transform(col("postings"), _.cast("string")))
            .cast("binary")).as("digest"),
          col("truncated"))

  /** Per-group score normalization: z-score (rounded — mean/std carry
    * summation-order noise), min-max and percent-rank (raw — both are
    * ratios of exact values, bit-identical across engines). */
  private val q_normalize: (SparkSession, String) => DataFrame =
    (s, dir) =>
      graft.agg.Normalize(t(s, dir, "lineitem"), "l_extendedprice",
        Seq("l_returnflag"), Seq("zscore", "minmax", "rank"))
        .select(col("l_orderkey").as("okey"), col("l_linenumber").as("lnum"),
          r6m(col("l_extendedprice_zscore")).as("z"),
          col("l_extendedprice_minmax").as("mm"),
          col("l_extendedprice_rank").as("pr"))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    q_interval_contain(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_interval_contain"    -> q_interval_contain,
    "q_interval_overlap"    -> q_interval_overlap,
    "q_interval_keep_first" -> q_interval_keep_first,
    "q_interval_binned"     -> q_interval_binned,
    "q_interval_ts"         -> q_interval_ts,
    "q_factorize_mixed"     -> q_factorize_mixed,
    "q_interval_outer"      -> q_interval_outer,
    "q_interval_indexers"   -> q_interval_indexers,
    "q_interval_open"       -> q_interval_open,
    "q_interval_keep_last"  -> keepQuery("last"),
    "q_interval_keep_both"  -> keepQuery("both"),
    "q_cross_join"          -> q_cross_join,
    "q_asof"                -> q_asof,
    "q_asof_merge"          -> q_asof_merge,
    "q_asof_forward"        -> q_asof_forward,
    "q_containing"          -> q_containing,
    "q_containing_length"   -> q_containing_length,
    "q_containing_multi"    -> q_containing_multi,
    "q_prev_next"           -> q_prev_next,
    "q_prev_next_global"    -> q_prev_next_global,
    "q_group_intervals"     -> q_group_intervals,
    "q_combine_union"       -> combineQuery(1, None),
    "q_combine_gaps"        -> combineQuery(0, Some(0)),
    "q_combine_attrs"       -> q_combine_attrs,
    "q_grouped_mode"        -> q_grouped_mode,
    "q_grouped_mode_nulls"  -> q_grouped_mode_nulls,
    "q_factorize"           -> q_factorize,
    "q_factorize_joint"     -> q_factorize_joint,
    "q_resample_eav_std"    -> q_resample_eav_std,
    "q_resample_eav_rank"   -> q_resample_eav_rank,
    "q_resample_eav_mode"   -> q_resample_eav_mode,
    "q_resample_eav_custom" -> q_resample_eav_custom,
    "q_resample_eav_flat"   -> q_resample_eav_flat,
    "q_resample_eav_more"   -> q_resample_eav_more,
    "q_resample_eav_unbounded" -> q_resample_eav_unbounded,
    "q_resample_interval"   -> q_resample_interval,
    "q_resample_interval_zero" -> q_resample_interval_zero,
    "q_resample_interval_unbounded" -> q_resample_interval_unbounded,
    "q_prev_next_fill"      -> q_prev_next_fill,
    "q_impute_ffill"        -> q_impute_ffill,
    "q_impute_global"       -> q_impute_global,
    "q_impute_linear"       -> q_impute_linear,
    "q_impute_afill"        -> q_impute_afill,
    "q_impute_bfill"        -> q_impute_bfill,
    "q_impute_lfill"        -> q_impute_lfill,
    "q_partition_series"    -> q_partition_series,
    "q_hist_width"          -> q_hist_width,
    "q_hist_quantile"       -> q_hist_quantile,
    "q_dedup_exact"         -> q_dedup_exact,
    "q_dedup_ngram"         -> q_dedup_ngram,
    "q_dedup_minhash"       -> q_dedup_minhash,
    "q_lsh_advise"          -> q_lsh_advise,
    "q_dedup_minhash_incr"  -> q_dedup_minhash_incr,
    "q_dedup_minhash_stream" -> q_dedup_minhash_stream,
    "q_dedup_anchor"        -> q_dedup_anchor,
    "q_dedup_anchor2"       -> q_dedup_anchor2,
    "q_dedup_cluster"       -> q_dedup_cluster,
    "q_pipeline"            -> q_pipeline,
    "q_pipeline5"           -> q_pipeline5,
    "q_dedup_simhash"       -> q_dedup_simhash,
    "q_dedup_simhash_stream" -> q_dedup_simhash_stream,
    "q_dedup_audit"         -> q_dedup_audit,
    "q_dedup_embcos"        -> q_dedup_embcos,
    "q_dedup_embcluster"    -> q_dedup_embcluster,
    "q_dedup_semantic"      -> q_dedup_semantic,
    "q_centroid"            -> q_centroid,
    "q_l2norm"              -> q_l2norm,
    "q_quantize"            -> q_quantize,
    "q_ann_q8"              -> q_ann_q8,
    "q_ann_topk"            -> q_ann_topk,
    "q_distinct_sketch"     -> q_distinct_sketch,
    "q_quantile_sketch"     -> q_quantile_sketch,
    "q_quantile_sketch_merge" -> q_quantile_sketch_merge,
    "q_distinct_sketch_merge" -> q_distinct_sketch_merge,
    "q_cms_tokens"          -> q_cms_tokens,
    "q_rand_proj"           -> q_rand_proj,
    "q_ann_lsh"             -> q_ann_lsh,
    "q_ann_lsh_mp"          -> q_ann_lsh_mp,
    "q_ann_lsh_layout"      -> q_ann_lsh_layout,
    "q_ann_lsh_lifecycle"   -> q_ann_lsh_lifecycle,
    "q_ann_lsh_mp2"         -> q_ann_lsh_mp2,
    "q_ann_lsh_mp2_layout"  -> q_ann_lsh_mp2_layout,
    "q_kmeans"              -> q_kmeans,
    "q_ann_ivf"             -> q_ann_ivf,
    "q_ann_pq"              -> q_ann_pq,
    "q_ann_ivfpq"           -> q_ann_ivfpq,
    "q_ann_ivf_trained"     -> q_ann_ivf_trained,
    "q_dedup_semantic_stream" -> q_dedup_semantic_stream,
    "q_hybrid_rrf"          -> q_hybrid_rrf,
    "q_hybrid_rrf_blocked"  -> q_hybrid_rrf_blocked,
    "q_ann_layout"          -> q_ann_layout,
    "q_ann_recall"          -> q_ann_recall,
    "q_ann_pq256"           -> q_ann_pq256,
    "q_ann_ivfpq_res"       -> q_ann_ivfpq_res,
    "q_ann_layout_append"   -> q_ann_layout_append,
    "q_ann_layout_compact"  -> q_ann_layout_compact,
    "q_ann_advise"          -> q_ann_advise,
    "q_salted_join"         -> q_salted_join,
    "q_bloom_join"          -> q_bloom_join,
    "q_profile"             -> q_profile,
    "q_skew"                -> q_skew,
    "q_topk"                -> q_topk,
    "q_sample_stratified"   -> q_sample_stratified,
    "q_sample_mixture"      -> q_sample_mixture,
    "q_token_plan"          -> q_token_plan,
    "q_token_sample"        -> q_token_sample,
    "q_sample_split"        -> q_sample_split,
    "q_split_bykey"         -> q_split_bykey,
    "q_top_tokens"          -> q_top_tokens,
    "q_bm25"                -> q_bm25,
    "q_tfidf"               -> q_tfidf,
    "q_span_dedup"          -> q_span_dedup,
    "q_dedup_incr"          -> q_dedup_incr,
    "q_text_chunks"         -> q_text_chunks,
    "q_lm_score"            -> q_lm_score,
    "q_lin_score"           -> q_lin_score,
    "q_mixture"             -> q_mixture,
    "q_negatives"           -> q_negatives,
    "q_changelog"           -> q_changelog,
    "q_labelprop"           -> q_labelprop,
    "q_pipeline4"           -> q_pipeline4,
    "q_bpe"                 -> q_bpe,
    "q_bpe_merges"          -> q_bpe_merges,
    "q_bpe_encode"          -> q_bpe_encode,
    "q_bpe_wordpiece"       -> q_bpe_wordpiece,
    "q_salted_sweep"        -> q_salted_sweep,
    "q_auto_sweep"          -> q_auto_sweep,
    "q_rule_auto_sweep"     -> q_rule_auto_sweep,
    "q_zorder"              -> q_zorder,
    "q_url_blocklist"       -> q_url_blocklist,
    "q_collocations"        -> q_collocations,
    "q_text_stats"          -> q_text_stats,
    "q_quality_gate"        -> q_quality_gate,
    "q_funnel"              -> q_funnel,
    "q_funnel_pipeline"     -> q_funnel_pipeline,
    "q_funnel_stream"       -> q_funnel_stream,
    "q_sample_temperature"  -> q_sample_temperature,
    "q_text_repetition"     -> q_text_repetition,
    "q_contamination"       -> q_contamination,
    "q_contamination_perrow" -> q_contamination_perrow,
    "q_sessionize"          -> q_sessionize,
    "q_text_scrub"          -> q_text_scrub,
    "q_url_normalize"       -> q_url_normalize,
    "q_html_extract"        -> q_html_extract,
    "q_pagerank"            -> q_pagerank,
    "q_wordpiece"           -> q_wordpiece,
    "q_script_id"           -> q_script_id,
    "q_packing"             -> q_packing,
    "q_langid"              -> q_langid,
    "q_text_fingerprint"    -> q_text_fingerprint,
    "q_media_frames"        -> q_media_frames,
    "q_media_features"      -> q_media_features,
    "q_media_dedup"         -> q_media_dedup,
    "q_media_phash"         -> q_media_phash,
    "q_media_video_dedup"   -> q_media_video_dedup,
    "q_media_video_stream"  -> q_media_video_stream,
    "q_media_dedup_stream"  -> q_media_dedup_stream,
    "q_audio_dedup"         -> q_audio_dedup,
    "q_audio_dedup_stream"  -> q_audio_dedup_stream,
    "q_pipeline6"           -> q_pipeline6,
    "q_line_dedup"          -> q_line_dedup,
    "q_sample_weighted"     -> q_sample_weighted,
    "q_normalize"           -> q_normalize,
    "q_inverted"            -> q_inverted,
    "q_text_clean"          -> q_text_clean,
    "q_interval_anti"       -> q_interval_anti,
    "q_interval_subtract"   -> q_interval_subtract,
    "q_interval_intersect"  -> q_interval_intersect,
    "q_pipeline3"           -> q_pipeline3,
    "q_fuzzy_join"          -> q_fuzzy_join,
    "q_fuzzy_freq"          -> q_fuzzy_freq,
    "q_pipeline2"           -> q_pipeline2,
    "q_sample_hash"         -> q_sample_hash,
    "q_layout_scan"         -> q_layout_scan,
    "q_csv_roundtrip"       -> q_csv_roundtrip,
    "q_orc_roundtrip"       -> q_orc_roundtrip,
    "q_rolling"             -> q_rolling,
    "q_rolling_rows"        -> q_rolling_rows,
    "q_json_extract"        -> q_json_extract,
    "q_winsorize"           -> q_winsorize,
    "q_bench_contain"       -> q_bench_contain,
    "q_binned_contain"      -> q_binned_contain,
    "q_binned_overlap"      -> q_binned_overlap,
    "q_bench_overlap"       -> q_bench_overlap,
    "q_rule_binned"         -> q_rule_binned,
    "q_rule_sweep"          -> q_rule_sweep,
    "q_dsir"                -> q_dsir,
  )

  /** DuckDB tokenization matching [[graft.text.Shingles.tokens]]. */
  /** Brute-force levenshtein join over the q_fuzzy_* subsets: the oracle
    * checks the q-gram blocking is COMPLETE (hash order and rarest-first
    * order alike), not just that verified pairs are correct. */
  private val FuzzyOracle =
    """WITH l AS (SELECT p_partkey AS lid, p_name AS lname
      |           FROM part WHERE p_partkey % 50 = 0),
      |r AS (SELECT p_partkey + 1000000000 AS rid,
      |        substring(p_name, 1, 3) || 'X' || substring(p_name, 5) AS rname
      |      FROM part WHERE p_partkey % 50 = 0)
      |SELECT l.lid, l.lname, r.rid, r.rname,
      |  levenshtein(l.lname, r.rname)::BIGINT AS distance
      |FROM l JOIN r ON levenshtein(l.lname, r.rname) <= 1""".stripMargin

  private val ToksExpr =
    "list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> len(x) > 0)"

  /** Shared DuckDB CTE: the 4 weekly windows per user (= [[userWeeks]]). */
  private val WeeksCte =
    """w AS (
      |  SELECT u.user_id, TIMESTAMP '2024-01-01' + i * 7 * INTERVAL 1 DAY AS ws,
      |         TIMESTAMP '2024-01-01' + (i * 7 + 7) * INTERVAL 1 DAY AS wt
      |  FROM (SELECT DISTINCT user_id FROM events) u
      |  CROSS JOIN generate_series(0, 3) AS t(i))""".stripMargin

  /** Shared DuckDB CTE: events.value with synthesized nulls + per-user
    * row numbers and fill helpers (= [[eventsWithNulls]] + Impute windows).
    */
  private val ImputeCte =
    """e AS (
      |  SELECT event_id, user_id, ts,
      |         CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS v
      |  FROM events),
      |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn FROM e),
      |f AS (SELECT *,
      |        LAST_VALUE(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY rn
      |          ROWS UNBOUNDED PRECEDING) AS pv,
      |        MAX(CASE WHEN v IS NOT NULL THEN rn END) OVER (PARTITION BY user_id ORDER BY rn
      |          ROWS UNBOUNDED PRECEDING) AS prn,
      |        FIRST_VALUE(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY rn
      |          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
      |        MIN(CASE WHEN v IS NOT NULL THEN rn END) OVER (PARTITION BY user_id ORDER BY rn
      |          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nrn
      |      FROM r)""".stripMargin

  /** DuckDB sweep-line SQL shared by the combine_intervals oracles. */
  private def combineOracle(flagCond: String): String =
    s"""WITH ev AS (
       |  SELECT o_custkey AS g, o_orderdate AS t, 1 AS d FROM orders
       |  UNION ALL
       |  SELECT o_custkey, o_orderdate + INTERVAL 30 DAY, -1 FROM orders),
       |c AS (SELECT g, t, SUM(d) AS d FROM ev GROUP BY g, t),
       |w AS (SELECT g, t,
       |        SUM(d) OVER (PARTITION BY g ORDER BY t ROWS UNBOUNDED PRECEDING) AS depth,
       |        LEAD(t) OVER (PARTITION BY g ORDER BY t) AS nt
       |      FROM c),
       |f AS (SELECT g, t, nt, ($flagCond AND nt IS NOT NULL) AS flag FROM w),
       |f2 AS (SELECT *, COALESCE(LAG(flag) OVER (PARTITION BY g ORDER BY t), FALSE) AS pflag FROM f),
       |sg AS (SELECT *, SUM(CASE WHEN flag AND NOT pflag THEN 1 ELSE 0 END)
       |         OVER (PARTITION BY g ORDER BY t ROWS UNBOUNDED PRECEDING) AS seg FROM f2)
       |SELECT g AS ckey, MIN(t) AS start, MAX(nt) AS stop
       |FROM sg WHERE flag GROUP BY g, seg HAVING MIN(t) < MAX(nt)""".stripMargin

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q_containing" ->
      """SELECT p.o_orderkey AS okey,
        |       COALESCE(MIN(i.o_orderkey), -1) AS first_id,
        |       COALESCE(MAX(i.o_orderkey), -1) AS last_id
        |FROM orders p LEFT JOIN orders i
        |  ON p.o_custkey = i.o_custkey
        | AND p.o_orderdate >= i.o_orderdate
        | AND p.o_orderdate <= i.o_orderdate + INTERVAL 15 DAY
        |GROUP BY p.o_orderkey""".stripMargin,
    "q_prev_next" ->
      """SELECT o_orderkey AS okey,
        |       LAG(o_totalprice) OVER w AS prev_price,
        |       LEAD(o_totalprice) OVER w AS next_price,
        |       ROW_NUMBER() OVER w = 1 AS is_first,
        |       ROW_NUMBER() OVER (PARTITION BY o_custkey
        |         ORDER BY o_orderdate DESC, o_orderkey DESC) = 1 AS is_last
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin,
    // CAST: DuckDB's window SUM over INTEGER yields HUGEINT, which lands
    // as float64 at the driver and hash-mismatches Spark's int64 (r1)
    "q_group_intervals" ->
      """WITH s AS (
        |  SELECT o_orderkey, o_custkey, o_orderdate AS st,
        |         o_orderdate + INTERVAL 30 DAY AS sp FROM orders),
        |m AS (
        |  SELECT *, MAX(sp) OVER (PARTITION BY o_custkey ORDER BY st, o_orderkey
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS cm FROM s),
        |n AS (
        |  SELECT *, CASE WHEN cm IS NULL OR st > cm + INTERVAL 5 DAY THEN 1 ELSE 0 END AS newc FROM m)
        |SELECT o_orderkey AS okey,
        |       CAST(SUM(newc) OVER (ORDER BY o_custkey, st, o_orderkey
        |                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS BIGINT) AS grp
        |FROM n""".stripMargin,
    "q_combine_union" -> combineOracle("depth >= 1"),
    "q_combine_gaps"  -> combineOracle("depth = 0"),
    // attr_cols sweep: depth at each boundary = number of DISTINCT
    // priorities with a net-positive interval count (equal-attr overlaps
    // count once, misc.py:367-401)
    "q_combine_attrs" ->
      """WITH ev AS (
        |  SELECT o_custkey AS g, o_orderpriority AS a, o_orderdate AS t, 1 AS d FROM orders
        |  UNION ALL
        |  SELECT o_custkey, o_orderpriority, o_orderdate + INTERVAL 30 DAY, -1 FROM orders),
        |bnd AS (SELECT DISTINCT g, t FROM ev),
        |dep AS (SELECT b.g, b.t, e.a, SUM(e.d) AS dp
        |        FROM bnd b JOIN ev e ON e.g = b.g AND e.t <= b.t GROUP BY 1, 2, 3),
        |act AS (SELECT g, t, COUNT(CASE WHEN dp > 0 THEN 1 END) AS depth FROM dep GROUP BY 1, 2),
        |w AS (SELECT g, t, depth, LEAD(t) OVER (PARTITION BY g ORDER BY t) AS nt FROM act),
        |f AS (SELECT g, t, nt, (depth >= 2 AND nt IS NOT NULL) AS flag FROM w),
        |f2 AS (SELECT *, COALESCE(LAG(flag) OVER (PARTITION BY g ORDER BY t), FALSE) AS pflag FROM f),
        |sg AS (SELECT *, SUM(CASE WHEN flag AND NOT pflag THEN 1 ELSE 0 END)
        |         OVER (PARTITION BY g ORDER BY t ROWS UNBOUNDED PRECEDING) AS seg FROM f2)
        |SELECT g AS ckey, MIN(t) AS start, MAX(nt) AS stop
        |FROM sg WHERE flag GROUP BY g, seg HAVING MIN(t) < MAX(nt)""".stripMargin,
    "q_grouped_mode" ->
      """WITH c AS (SELECT l_orderkey, l_returnflag AS v, COUNT(*) AS n
        |           FROM lineitem WHERE l_returnflag IS NOT NULL GROUP BY 1, 2),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY l_orderkey
        |        ORDER BY n DESC, v ASC) AS rn FROM c)
        |SELECT l_orderkey AS okey, v AS mode, n AS count FROM r WHERE rn = 1""".stripMargin,
    "q_grouped_mode_nulls" ->
      """WITH v AS (SELECT l_orderkey AS k,
        |             CASE WHEN l_linenumber % 3 = 0 THEN NULL ELSE l_returnflag END AS v
        |           FROM lineitem),
        |c AS (SELECT k, v, COUNT(*) AS n FROM v GROUP BY 1, 2),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY k
        |        ORDER BY n DESC, v ASC NULLS LAST) AS rn FROM c)
        |SELECT k AS okey, v AS mode, n AS count FROM r WHERE rn = 1""".stripMargin,
    "q_factorize_joint" ->
      """WITH ks AS (SELECT DISTINCT o_orderstatus AS k FROM orders
        |            UNION SELECT DISTINCT l_linestatus FROM lineitem),
        |c AS (SELECT k, DENSE_RANK() OVER (ORDER BY k) - 1 AS code FROM ks)
        |SELECT 'o' AS side, o_orderkey AS id, 0 AS sub, c.code
        |FROM orders JOIN c ON c.k = orders.o_orderstatus
        |UNION ALL
        |SELECT 'l', l_orderkey, l_linenumber, c.code
        |FROM lineitem JOIN c ON c.k = lineitem.l_linestatus""".stripMargin,
    "q_factorize" ->
      """SELECT l_orderkey AS okey, l_linenumber AS lnum,
        |       DENSE_RANK() OVER (ORDER BY l_returnflag, l_linestatus) - 1 AS code
        |FROM lineitem""".stripMargin,
    "q_factorize_mixed" ->
      """SELECT o_orderkey AS okey,
        |       DENSE_RANK() OVER (ORDER BY o_orderstatus, o_orderdate,
        |         o_totalprice > 100000.0) - 1 AS code
        |FROM orders""".stripMargin,
    "q_interval_contain" ->
      """SELECT o.o_orderkey AS okey, l.l_linenumber AS lnum, l.l_shipdate AS ship
        |FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |  AND l.l_shipdate >= o.o_orderdate
        |  AND l.l_shipdate <= o.o_orderdate + INTERVAL 30 DAY""".stripMargin,
    "q_interval_overlap" ->
      """SELECT a.o_orderkey AS lkey, b.o_orderkey AS rkey
        |FROM orders a JOIN orders b ON a.o_custkey = b.o_custkey
        |  AND a.o_orderdate <= b.o_orderdate + INTERVAL 15 DAY
        |  AND b.o_orderdate <= a.o_orderdate + INTERVAL 30 DAY""".stripMargin,
    "q_interval_outer" ->
      """WITH a AS (SELECT o_orderkey, o_custkey, o_orderdate AS s,
        |             o_orderdate + INTERVAL 30 DAY AS e
        |           FROM orders WHERE o_orderkey % 3 = 0),
        |b AS (SELECT o_orderkey, o_custkey, o_orderdate AS s,
        |        o_orderdate + INTERVAL 15 DAY AS e
        |      FROM orders WHERE o_orderkey % 3 = 1)
        |SELECT a.o_orderkey AS lkey, b.o_orderkey AS rkey
        |FROM a FULL JOIN b ON a.o_custkey = b.o_custkey
        |  AND a.s <= b.e AND b.s <= a.e""".stripMargin,
    "q_interval_indexers" ->
      """WITH a AS (SELECT o_orderkey, o_custkey, o_orderdate AS s,
        |             o_orderdate + INTERVAL 30 DAY AS e
        |           FROM orders WHERE o_orderkey % 3 = 0),
        |b AS (SELECT o_orderkey, o_custkey, o_orderdate AS s,
        |        o_orderdate + INTERVAL 15 DAY AS e
        |      FROM orders WHERE o_orderkey % 3 = 1)
        |SELECT coalesce(a.o_orderkey, -1) AS left_idx,
        |       coalesce(b.o_orderkey, -1) AS right_idx
        |FROM a FULL JOIN b ON a.o_custkey = b.o_custkey
        |  AND a.s <= b.e AND b.s <= a.e""".stripMargin,
    "q_interval_open" ->
      """SELECT o.o_orderkey AS okey, l.l_linenumber AS lnum, l.l_shipdate AS ship
        |FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |  AND l.l_shipdate > o.o_orderdate
        |  AND l.l_shipdate < o.o_orderdate + INTERVAL 30 DAY""".stripMargin,
    "q_interval_keep_first" ->
      """WITH j AS (
        |  SELECT a.o_orderkey AS lkey, b.o_orderkey AS rkey,
        |         ROW_NUMBER() OVER (PARTITION BY a.o_orderkey ORDER BY b.o_orderkey) AS rn
        |  FROM orders a JOIN orders b ON a.o_custkey = b.o_custkey
        |    AND a.o_orderdate <= b.o_orderdate + INTERVAL 15 DAY
        |    AND b.o_orderdate <= a.o_orderdate + INTERVAL 30 DAY)
        |SELECT lkey, rkey FROM j WHERE rn = 1""".stripMargin,
    "q_resample_eav_std" ->
      s"""WITH $WeeksCte,
        |j AS (SELECT w.user_id AS uid, w.ws, e.event_type AS et, e.value AS val
        |      FROM w LEFT JOIN events e ON e.user_id = w.user_id
        |        AND e.ts >= w.ws AND e.ts < w.wt),
        |m AS (SELECT uid, ws, AVG(CASE WHEN et = 'error' THEN val END) AS errm
        |      FROM j GROUP BY 1, 2)
        |SELECT j.uid, j.ws,
        |  ROUND(AVG(CASE WHEN et = 'click' THEN val END), 6) + 0.0 AS click_mean,
        |  ROUND(SUM(CASE WHEN et = 'click' THEN val END), 6) + 0.0 AS click_sum,
        |  COUNT(CASE WHEN et = 'click' THEN val END) AS click_count,
        |  MIN(CASE WHEN et = 'click' THEN val END) AS click_min,
        |  MAX(CASE WHEN et = 'click' THEN val END) AS click_max,
        |  ROUND(QUANTILE_CONT(CASE WHEN et = 'click' THEN val END, 0.5), 6) + 0.0 AS click_p50,
        |  ROUND(SUM(CASE WHEN et = 'purchase' THEN val END), 6) + 0.0 AS purchase_sum,
        |  COUNT(CASE WHEN et = 'purchase' THEN 1 END) AS purchase_size,
        |  COUNT(DISTINCT CASE WHEN et = 'purchase' THEN val END) AS purchase_nunique,
        |  ROUND(STDDEV_SAMP(CASE WHEN et = 'purchase' THEN val END), 6) + 0.0 AS purchase_std,
        |  COUNT(CASE WHEN et = 'error' THEN val END) AS error_count,
        |  ROUND(AVG(CASE WHEN et = 'error' THEN ABS(val - m.errm) END) + 1e-9, 6) + 0.0 AS error_mad,
        |  ROUND(STDDEV_SAMP(CASE WHEN et = 'error' THEN val END)
        |    / SQRT(COUNT(CASE WHEN et = 'error' THEN val END)), 6) + 0.0 AS error_sem
        |FROM j JOIN m USING (uid, ws) GROUP BY 1, 2""".stripMargin,
    "q_resample_eav_rank" ->
      s"""WITH $WeeksCte,
        |j AS (SELECT w.user_id AS uid, w.ws, e.ts, e.value,
        |        ROW_NUMBER() OVER (PARTITION BY w.user_id, w.ws ORDER BY e.ts) AS ra,
        |        ROW_NUMBER() OVER (PARTITION BY w.user_id, w.ws ORDER BY e.ts DESC) AS rd
        |      FROM w JOIN events e ON e.user_id = w.user_id
        |        AND e.ts >= w.ws AND e.ts < w.wt AND e.event_type = 'view')
        |SELECT w.user_id AS uid, w.ws,
        |  MAX(CASE WHEN j.ra = 1 THEN j.value END) AS r0,
        |  MAX(CASE WHEN j.ra = 1 THEN j.ts END) AS t0,
        |  MAX(CASE WHEN j.rd = 1 THEN j.value END) AS rlast,
        |  MAX(CASE WHEN j.rd = 1 THEN j.ts END) AS tlast
        |FROM w LEFT JOIN j ON j.uid = w.user_id AND j.ws = w.ws
        |GROUP BY 1, 2""".stripMargin,
    "q_resample_eav_mode" ->
      s"""WITH $WeeksCte,
        |c AS (SELECT w.user_id AS uid, w.ws, e.value AS val, COUNT(*) AS n
        |      FROM w JOIN events e ON e.user_id = w.user_id
        |        AND e.ts >= w.ws AND e.ts < w.wt
        |        AND e.event_type = 'signup' AND e.value IS NOT NULL
        |      GROUP BY 1, 2, 3),
        |rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY uid, ws
        |         ORDER BY n DESC, val ASC) AS rn FROM c)
        |SELECT w.user_id AS uid, w.ws, rk.val AS mode, COALESCE(rk.n, 0) AS mc
        |FROM w LEFT JOIN rk ON rk.uid = w.user_id AND rk.ws = w.ws AND rk.rn = 1""".stripMargin,
    "q_resample_eav_custom" ->
      s"""WITH $WeeksCte,
        |j AS (SELECT w.user_id AS uid, w.ws, e.ts, e.value
        |      FROM w JOIN events e ON e.user_id = w.user_id
        |        AND e.ts >= w.ws AND e.ts < w.wt AND e.event_type = 'purchase')
        |SELECT w.user_id AS uid, w.ws,
        |  COUNT(j.value) AS cnt,
        |  ARG_MAX(j.ts, j.value) AS tmax,
        |  ROUND(SUM(j.value * j.value), 6) + 0.0 AS ssq
        |FROM w LEFT JOIN j ON j.uid = w.user_id AND j.ws = w.ws
        |GROUP BY 1, 2""".stripMargin,
    // flat escape hatch: one row per (window, attr) actually present
    "q_resample_eav_flat" ->
      s"""WITH $WeeksCte,
        |j AS (SELECT w.user_id AS uid, w.ws, e.event_type AS attr, e.ts, e.value
        |      FROM w JOIN events e ON e.user_id = w.user_id
        |        AND e.ts >= w.ws AND e.ts < w.wt
        |        AND e.event_type IN ('click', 'purchase'))
        |SELECT uid, ws, attr, COUNT(*) AS n,
        |  MIN(value) AS vmin, ARG_MAX(value, ts) AS vlast
        |FROM j GROUP BY 1, 2, 3""".stripMargin,
    "q_resample_interval" ->
      """WITH w AS (SELECT o_custkey AS ck, MIN(o_orderdate) AS ws,
        |             MIN(o_orderdate) + INTERVAL 60 DAY AS wt
        |           FROM orders GROUP BY 1),
        |i AS (SELECT o_custkey AS ck, o_orderdate AS a,
        |        o_orderdate + INTERVAL 30 DAY AS b, o_totalprice AS v FROM orders)
        |SELECT w.ck AS ckey, w.ws,
        |  ROUND(COALESCE(SUM(i.v * (EPOCH(LEAST(i.b, w.wt)) - EPOCH(GREATEST(i.a, w.ws)))
        |    / (EPOCH(i.b) - EPOCH(i.a))), 0.0), 6) + 0.0 AS vsum
        |FROM w LEFT JOIN i ON i.ck = w.ck AND i.a <= w.wt AND w.ws <= i.b
        |GROUP BY 1, 2""".stripMargin,
    "q_resample_interval_zero" ->
      """WITH w AS (SELECT o_custkey AS ck, MIN(o_orderdate) AS ws,
        |             MIN(o_orderdate) + INTERVAL 60 DAY AS wt
        |           FROM orders GROUP BY 1),
        |i AS (SELECT o_custkey AS ck, o_orderdate AS a,
        |        CASE WHEN o_orderkey % 2 = 0 THEN o_orderdate
        |             ELSE o_orderdate + INTERVAL 30 DAY END AS b,
        |        o_totalprice AS v FROM orders)
        |SELECT w.ck AS ckey, w.ws,
        |  ROUND(COALESCE(SUM(CASE WHEN i.a = i.b THEN i.v
        |    ELSE i.v * (EPOCH(LEAST(i.b, w.wt)) - EPOCH(GREATEST(i.a, w.ws)))
        |           / (EPOCH(i.b) - EPOCH(i.a)) END), 0.0), 6) + 0.0 AS vsum
        |FROM w LEFT JOIN i ON i.ck = w.ck AND i.a <= w.wt AND w.ws <= i.b
        |GROUP BY 1, 2""".stripMargin,
    "q_resample_interval_unbounded" ->
      """WITH w AS (SELECT o_custkey AS ck, MIN(o_orderdate) AS ws FROM orders GROUP BY 1),
        |s AS (SELECT o_custkey AS ck, SUM(o_totalprice) AS sv FROM orders GROUP BY 1)
        |SELECT w.ck AS ckey, w.ws, ROUND(COALESCE(s.sv, 0.0), 6) + 0.0 AS vsum
        |FROM w LEFT JOIN s USING (ck)""".stripMargin,
    "q_prev_next_fill" ->
      """SELECT o_orderkey AS okey,
        |       COALESCE(LAG(o_totalprice) OVER w, -1.0) AS prev_price,
        |       COALESCE(LEAD(o_totalprice) OVER w, -1.0) AS next_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin,
    "q_prev_next_global" ->
      """SELECT o_orderkey AS okey,
        |       COALESCE(LAG(o_totalprice) OVER w, -1.0) AS prev_price,
        |       LEAD(o_totalprice) OVER w AS next_price,
        |       ROW_NUMBER() OVER w = 1 AS is_first
        |FROM orders
        |WINDOW w AS (ORDER BY o_orderdate, o_orderkey)""".stripMargin,
    "q_impute_ffill" ->
      s"""WITH $ImputeCte
        |SELECT event_id AS eid,
        |  CASE WHEN v IS NOT NULL THEN v WHEN rn - prn <= 2 THEN pv END AS v_imp
        |FROM f""".stripMargin,
    "q_impute_linear" ->
      s"""WITH $ImputeCte
        |SELECT event_id AS eid,
        |  CASE WHEN v IS NOT NULL THEN v
        |       WHEN pv IS NULL OR nv IS NULL THEN NULL
        |       ELSE pv + (nv - pv) * ((rn - prn) / CAST(nrn - prn AS DOUBLE))
        |  END AS v_imp
        |FROM f""".stripMargin,
    "q_impute_afill" ->
      s"""WITH $ImputeCte
        |SELECT event_id AS eid,
        |  CASE WHEN v IS NOT NULL THEN v
        |       WHEN pv IS NOT NULL AND nv IS NOT NULL THEN pv + (nv - pv) / 2
        |       ELSE COALESCE(pv, nv) END AS v_imp
        |FROM f""".stripMargin,
    "q_impute_global" ->
      """WITH e AS (
        |  SELECT event_id, ts,
        |         CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS v
        |  FROM events),
        |r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY ts, event_id) AS rn FROM e),
        |f AS (SELECT *,
        |        LAST_VALUE(v IGNORE NULLS) OVER (ORDER BY rn
        |          ROWS UNBOUNDED PRECEDING) AS pv,
        |        MAX(CASE WHEN v IS NOT NULL THEN rn END) OVER (ORDER BY rn
        |          ROWS UNBOUNDED PRECEDING) AS prn,
        |        FIRST_VALUE(v IGNORE NULLS) OVER (ORDER BY rn
        |          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        |        MIN(CASE WHEN v IS NOT NULL THEN rn END) OVER (ORDER BY rn
        |          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nrn
        |      FROM r),
        |g AS (SELECT event_id,
        |        CASE WHEN v IS NOT NULL THEN v
        |             WHEN rn - prn <= 3 THEN pv END AS fl,
        |        CASE WHEN v IS NOT NULL THEN v
        |             WHEN nrn - rn <= 3 THEN nv END AS bl
        |      FROM f)
        |SELECT event_id AS eid,
        |  CASE WHEN fl IS NOT NULL AND bl IS NOT NULL THEN fl + (bl - fl) / 2
        |       ELSE COALESCE(fl, bl) END AS v_imp
        |FROM g""".stripMargin,
    "q_interval_binned" ->
      """SELECT a.o_orderkey AS lkey, b.o_orderkey AS rkey
        |FROM orders a JOIN orders b
        |  ON a.o_orderdate <= b.o_orderdate + INTERVAL 3 DAY
        | AND b.o_orderdate <= a.o_orderdate + INTERVAL 2 DAY
        |WHERE a.o_orderkey % 97 = 0 AND b.o_orderkey % 13 = 0""".stripMargin,
    // half-open timestamp windows with per-row length: ship in
    // [orderdate, orderdate + (okey%30+1) days)
    "q_interval_ts" ->
      """SELECT o.o_orderkey AS okey, l.l_linenumber AS lnum,
        |  o.o_orderdate + to_days(CAST(o.o_orderkey % 30 + 1 AS INTEGER)) AS wstop,
        |  l.l_shipdate AS ship
        |FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |  AND l.l_shipdate >= o.o_orderdate
        |  AND l.l_shipdate < o.o_orderdate + to_days(CAST(o.o_orderkey % 30 + 1 AS INTEGER))""".stripMargin,
    "q_interval_keep_last" ->
      """WITH j AS (
        |  SELECT a.o_orderkey AS lkey, b.o_orderkey AS rkey,
        |         ROW_NUMBER() OVER (PARTITION BY a.o_orderkey ORDER BY b.o_orderkey DESC) AS rn
        |  FROM orders a JOIN orders b ON a.o_custkey = b.o_custkey
        |    AND a.o_orderdate <= b.o_orderdate + INTERVAL 15 DAY
        |    AND b.o_orderdate <= a.o_orderdate + INTERVAL 30 DAY)
        |SELECT lkey, rkey FROM j WHERE rn = 1""".stripMargin,
    // keep=both: first AND last match per left row, deduped when equal
    "q_interval_keep_both" ->
      """WITH j AS (
        |  SELECT a.o_orderkey AS lkey, b.o_orderkey AS rkey,
        |         ROW_NUMBER() OVER (PARTITION BY a.o_orderkey ORDER BY b.o_orderkey) AS ra,
        |         ROW_NUMBER() OVER (PARTITION BY a.o_orderkey ORDER BY b.o_orderkey DESC) AS rd
        |  FROM orders a JOIN orders b ON a.o_custkey = b.o_custkey
        |    AND a.o_orderdate <= b.o_orderdate + INTERVAL 15 DAY
        |    AND b.o_orderdate <= a.o_orderdate + INTERVAL 30 DAY)
        |SELECT DISTINCT lkey, rkey FROM j WHERE ra = 1 OR rd = 1""".stripMargin,
    "q_cross_join" ->
      """SELECT n.n_nationkey AS nk, r.r_regionkey AS rk
        |FROM nation n CROSS JOIN region r""".stripMargin,
    "q_asof" ->
      """WITH c AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click'),
        |p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |j AS (SELECT p.event_id, c.ts AS cts, c.value AS cv,
        |        ROW_NUMBER() OVER (PARTITION BY p.event_id ORDER BY c.ts DESC) AS rn
        |      FROM p JOIN c ON c.user_id = p.user_id
        |        AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 DAY)
        |SELECT p.event_id AS eid, j.cts AS click_ts, j.cv AS click_v
        |FROM p LEFT JOIN j ON j.event_id = p.event_id AND j.rn = 1""".stripMargin,
    "q_asof_merge" ->
      """WITH c AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click'),
        |p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |j AS (SELECT p.event_id, c.ts AS cts, c.value AS cv,
        |        ROW_NUMBER() OVER (PARTITION BY p.event_id ORDER BY c.ts DESC) AS rn
        |      FROM p JOIN c ON c.user_id = p.user_id
        |        AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 DAY)
        |SELECT p.event_id AS eid, j.cts AS click_ts, j.cv AS click_v
        |FROM p LEFT JOIN j ON j.event_id = p.event_id AND j.rn = 1""".stripMargin,
    "q_containing_multi" ->
      """WITH a AS (
        |  SELECT p.o_orderkey AS okey,
        |         COALESCE(MIN(i.o_orderkey), -1) AS f1,
        |         COALESCE(MAX(i.o_orderkey), -1) AS l1
        |  FROM orders p LEFT JOIN orders i ON p.o_custkey = i.o_custkey
        |    AND p.o_orderdate >= i.o_orderdate
        |    AND p.o_orderdate <= i.o_orderdate + INTERVAL 15 DAY
        |  GROUP BY 1),
        |b AS (
        |  SELECT p.o_orderkey AS okey,
        |         COALESCE(MIN(i.o_orderkey), -1) AS f2,
        |         COALESCE(MAX(i.o_orderkey), -1) AS l2
        |  FROM orders p LEFT JOIN orders i ON p.o_custkey = i.o_custkey
        |    AND p.o_orderdate + INTERVAL 7 DAY >= i.o_orderdate
        |    AND p.o_orderdate + INTERVAL 7 DAY <= i.o_orderdate + INTERVAL 15 DAY
        |  GROUP BY 1)
        |SELECT a.okey, a.f1, a.l1, b.f2, b.l2 FROM a JOIN b USING (okey)""".stripMargin,
    "q_asof_forward" ->
      """WITH c AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click'),
        |p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |j AS (SELECT p.event_id, c.ts AS cts, c.value AS cv,
        |        ROW_NUMBER() OVER (PARTITION BY p.event_id ORDER BY c.ts ASC) AS rn
        |      FROM p JOIN c ON c.user_id = p.user_id AND c.ts >= p.ts)
        |SELECT p.event_id AS eid, j.cts AS click_ts, j.cv AS click_v
        |FROM p LEFT JOIN j ON j.event_id = p.event_id AND j.rn = 1""".stripMargin,
    "q_containing_length" ->
      """SELECT p.o_orderkey AS okey, COALESCE(MIN(i.o_orderkey), -1) AS first_id
        |FROM orders p LEFT JOIN orders i
        |  ON p.o_custkey = i.o_custkey
        | AND p.o_orderdate >= i.o_orderdate
        | AND p.o_orderdate <= i.o_orderdate + INTERVAL 15 DAY
        |GROUP BY p.o_orderkey""".stripMargin,
    "q_resample_eav_more" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |j AS (SELECT u.user_id AS uid, e.value AS val,
        |        1.0 + fmod(e.value, 1.0) / 100.0 AS cval
        |      FROM u LEFT JOIN events e ON e.user_id = u.user_id
        |        AND e.event_type = 'view'
        |        AND e.ts >= TIMESTAMP '2024-01-01' AND e.ts < TIMESTAMP '2024-01-29')
        |SELECT uid,
        |  CASE WHEN COUNT(val) >= 2 THEN ROUND(VAR_SAMP(val), 6) + 0.0 END AS vvar,
        |  CASE WHEN COUNT(val) >= 3 THEN ROUND(skewness(val), 6) + 0.0 END AS vskew,
        |  ROUND(product(cval), 6) + 0.0 AS vprod,
        |  ROUND(QUANTILE_CONT(val, 0.25), 6) + 0.0 AS vp25,
        |  COUNT(val) AS vcnt
        |FROM j GROUP BY 1""".stripMargin,
    "q_resample_eav_unbounded" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |j AS (SELECT u.user_id AS uid, e.ts, e.value,
        |        ROW_NUMBER() OVER (PARTITION BY u.user_id ORDER BY e.ts) AS ra
        |      FROM u JOIN events e ON e.user_id = u.user_id
        |        AND e.event_type = 'view' AND e.ts < TIMESTAMP '2024-01-15')
        |SELECT u.user_id AS uid,
        |  MAX(CASE WHEN j.ra = 1 THEN j.value END) AS r0,
        |  MAX(CASE WHEN j.ra = 1 THEN j.ts END) AS t0,
        |  COUNT(j.value) AS cnt
        |FROM u LEFT JOIN j ON j.uid = u.user_id
        |GROUP BY 1""".stripMargin,
    "q_impute_bfill" ->
      s"""WITH $ImputeCte
        |SELECT event_id AS eid,
        |  CASE WHEN v IS NOT NULL THEN v WHEN nrn - rn <= 2 THEN nv END AS v_imp
        |FROM f""".stripMargin,
    "q_impute_lfill" ->
      s"""WITH $ImputeCte
        |SELECT event_id AS eid,
        |  CASE WHEN v IS NOT NULL THEN v
        |       WHEN pv IS NOT NULL AND nv IS NOT NULL
        |         THEN pv + (nv - pv) * ((rn - prn) / CAST(nrn - prn AS DOUBLE))
        |       ELSE COALESCE(pv, nv) END AS v_imp
        |FROM f""".stripMargin,
    "q_partition_series" ->
      """WITH s AS (SELECT l_orderkey AS g, COUNT(*) AS n FROM lineitem GROUP BY 1),
        |c AS (SELECT g, SUM(LEAST(n, 1000)) OVER (ORDER BY g
        |        ROWS UNBOUNDED PRECEDING) AS cum FROM s)
        |SELECT g, CAST(FLOOR((cum - 1) / 1000.0) AS BIGINT) AS pid FROM c""".stripMargin,
    "q_hist_width" ->
      """WITH s AS (SELECT l_returnflag AS g, MIN(l_extendedprice) AS mn,
        |             MAX(l_extendedprice) AS mx FROM lineitem GROUP BY 1),
        |b AS (SELECT s.g,
        |        CAST(CASE WHEN mx = mn THEN 0
        |          ELSE LEAST(FLOOR((l_extendedprice - mn) * 8 / (mx - mn)), 7)
        |        END AS BIGINT) AS bin,
        |        l_extendedprice AS v
        |      FROM lineitem l JOIN s ON l.l_returnflag = s.g)
        |SELECT g, bin, COUNT(*) AS n, MIN(v) AS lo, MAX(v) AS hi
        |FROM b GROUP BY 1, 2""".stripMargin,
    "q_hist_quantile" ->
      """WITH r AS (SELECT o_orderpriority AS g, o_totalprice AS v,
        |             NTILE(4) OVER (PARTITION BY o_orderpriority
        |               ORDER BY o_totalprice, o_orderkey) AS bucket
        |           FROM orders)
        |SELECT g, bucket, COUNT(*) AS n, MIN(v) AS lo, MAX(v) AS hi
        |FROM r GROUP BY 1, 2""".stripMargin,
    "q_dedup_exact" ->
      "SELECT MIN(doc_id) AS cid, COUNT(*) AS n FROM documents GROUP BY text",
    // fixed-size slice (doc_id < 500): the exact verifier demo — see the
    // query's scaladoc; constant work at any scale factor
    "q_dedup_ngram" ->
      s"""WITH d AS (SELECT doc_id, lang, list_distinct($ToksExpr) AS tk
        |           FROM documents WHERE doc_id < 500)
        |SELECT a.doc_id AS id_l, b.doc_id AS id_r,
        |  len(list_intersect(a.tk, b.tk))::DOUBLE
        |    / (len(a.tk) + len(b.tk) - len(list_intersect(a.tk, b.tk))) AS jaccard
        |FROM d a JOIN d b ON a.lang = b.lang AND a.doc_id < b.doc_id
        |WHERE len(list_intersect(a.tk, b.tk))::DOUBLE
        |    / (len(a.tk) + len(b.tk) - len(list_intersect(a.tk, b.tk))) >= 0.9""".stripMargin,
    // exact 3-gram-Jaccard oracle: at J >= 0.8 the 16x2 LSH bands miss a
    // true pair with probability (1-0.64)^16 < 1e-7, so LSH == exact here
    "q_dedup_minhash" ->
      s"""WITH dd AS (SELECT doc_id, $ToksExpr AS tk FROM documents),
        |g AS (SELECT doc_id, list_distinct(
        |        [list_aggregate(tk[i:i+2], 'string_agg', ' ')
        |         FOR i IN range(1, greatest(len(tk) - 2, 1) + 1)]) AS sh FROM dd)
        |SELECT a.doc_id AS id_l, b.doc_id AS id_r,
        |  len(list_intersect(a.sh, b.sh))::DOUBLE
        |    / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
        |FROM g a JOIN g b ON a.doc_id < b.doc_id
        |WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
        |    / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.8""".stripMargin,
    // bipartite variant of the q_dedup_minhash oracle: batch (doc_id % 10
    // = 0) vs corpus (rest), exact 3-gram Jaccard — same completeness
    // argument as above
    "q_dedup_minhash_incr" ->
      s"""WITH dd AS (SELECT doc_id, $ToksExpr AS tk FROM documents),
        |g AS (SELECT doc_id, list_distinct(
        |        [list_aggregate(tk[i:i+2], 'string_agg', ' ')
        |         FOR i IN range(1, greatest(len(tk) - 2, 1) + 1)]) AS sh FROM dd),
        |bt AS (SELECT * FROM g WHERE doc_id % 10 = 0),
        |cp AS (SELECT * FROM g WHERE doc_id % 10 <> 0)
        |SELECT bt.doc_id AS id_b, cp.doc_id AS id_c,
        |  len(list_intersect(bt.sh, cp.sh))::DOUBLE
        |    / (len(bt.sh) + len(cp.sh) - len(list_intersect(bt.sh, cp.sh))) AS jaccard
        |FROM bt JOIN cp ON true
        |WHERE len(list_intersect(bt.sh, cp.sh))::DOUBLE
        |    / (len(bt.sh) + len(cp.sh) - len(list_intersect(bt.sh, cp.sh))) >= 0.8""".stripMargin,
    // same bipartite exact-Jaccard oracle as q_dedup_minhash_incr: the
    // streaming gate in batch mode must produce the identical pair set
    "q_dedup_minhash_stream" ->
      s"""WITH dd AS (SELECT doc_id, $ToksExpr AS tk FROM documents),
        |g AS (SELECT doc_id, list_distinct(
        |        [list_aggregate(tk[i:i+2], 'string_agg', ' ')
        |         FOR i IN range(1, greatest(len(tk) - 2, 1) + 1)]) AS sh FROM dd),
        |bt AS (SELECT * FROM g WHERE doc_id % 10 = 0),
        |cp AS (SELECT * FROM g WHERE doc_id % 10 <> 0)
        |SELECT bt.doc_id AS id_b, cp.doc_id AS id_c,
        |  len(list_intersect(bt.sh, cp.sh))::DOUBLE
        |    / (len(bt.sh) + len(cp.sh) - len(list_intersect(bt.sh, cp.sh))) AS jaccard
        |FROM bt JOIN cp ON true
        |WHERE len(list_intersect(bt.sh, cp.sh))::DOUBLE
        |    / (len(bt.sh) + len(cp.sh) - len(list_intersect(bt.sh, cp.sh))) >= 0.8""".stripMargin,
    // closure of the EXACT 3-gram-Jaccard pairs (complete at 16x2 bands
    // whp): anchor pairing must lose no cluster structure
    "q_dedup_anchor" -> AnchorClosureSql,
    "q_dedup_anchor2" -> AnchorClosureSql,
    // the production chain (exact collapse → anchor2 LSH on survivors →
    // closure with twin edges) must label identically to the closure of
    // the exact 3-gram pair set over ALL docs — twins sit at J = 1, so
    // collapsing them first cannot change a component
    "q_dedup_cluster" -> AnchorClosureSql,
    // near-dup stage oracle = closure of the EXACT 3-gram-Jaccard pairs
    // over the survivors (LSH 16x2 bands complete at J >= 0.8 whp, and
    // anchor2 pairing loses no cluster structure — q_dedup_anchor/2
    // prove both legs separately)
    "q_pipeline" ->
      s"""WITH RECURSIVE
        |d0 AS (SELECT doc_id, text, lang, source, len($ToksExpr) AS ntok
        |       FROM documents),
        |d1 AS (SELECT * FROM d0 WHERE ntok >= 5),
        |sv AS (SELECT MIN(doc_id) AS doc_id FROM d1 GROUP BY text),
        |d3 AS (SELECT d1.* FROM d1 JOIN sv USING (doc_id)),
        |dt AS (SELECT doc_id, $ToksExpr AS tk FROM d3),
        |dk AS (SELECT doc_id, list_distinct(
        |        [list_aggregate(tk[i:i+2], 'string_agg', ' ')
        |         FOR i IN range(1, greatest(len(tk) - 2, 1) + 1)]) AS sh FROM dt),
        |p AS (SELECT a.doc_id AS u, b.doc_id AS v
        |      FROM dk a JOIN dk b ON a.doc_id < b.doc_id
        |      WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
        |          / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.8),
        |e AS (SELECT u, v FROM p UNION SELECT v, u FROM p),
        |reach(u, v) AS (SELECT u, u FROM (SELECT DISTINCT u FROM e) t
        |                UNION SELECT r.u, ed.v FROM reach r JOIN e ed ON r.v = ed.u),
        |comp AS (SELECT u AS node, MIN(v) AS comp FROM reach GROUP BY u),
        |keep AS (SELECT d3.* FROM d3 LEFT JOIN comp ON d3.doc_id = comp.node
        |         WHERE d3.doc_id = COALESCE(comp.comp, d3.doc_id))
        |SELECT lang, source, COUNT(*) AS n_docs,
        |       CAST(SUM(ntok) AS BIGINT) AS n_tokens
        |FROM keep GROUP BY 1, 2""".stripMargin,
    "q_pipeline5" -> {
      // the full 8-stage chain replayed: gopher rules → url blocklist →
      // exact dedup → exact-Jaccard closure (complete for the LSH pair
      // set whp, same argument as q_dedup_minhash) → cell-blocked
      // cosine closure → 4-gram decontamination → unrolled BPE + greedy
      // wordpiece walk (trained FROM q6, the curated corpus) → prefix-
      // sum packing. Any membership or boundary drift anywhere fails
      // the final hash. The stage CTEs are MATERIALIZED: each is
      // referenced 2-3× downstream, and inlining re-evaluates the whole
      // chain below it per reference (measured: the un-hinted plan
      // exhausts the fd limit re-opening the parquet). Do NOT hint `v`:
      // a materialized piece vocab breaks DuckDB's correlated-LATERAL
      // longest-match walk (observed: every word degrades to [UNK]).
      val bpe5 = bpeCteFrom("q6").stripPrefix("WITH ")
      s"""WITH RECURSIVE
        |$Pipeline5StageCtes,
        |$bpe5,
        |pb AS (SELECT replace(syms[i], '</w>', '') AS body, (i > 1) AS cont
        |  FROM (SELECT syms, unnest(range(1, len(syms) + 1)) AS i FROM v3)),
        |pieces AS (SELECT DISTINCT body, cont FROM pb WHERE body <> ''),
        |v AS (SELECT CASE WHEN cont THEN '##' || body ELSE body END AS piece,
        |        body, cont FROM pieces),
        |w AS (SELECT doc_id, pos, word FROM (
        |    SELECT doc_id, unnest(string_split_regex(text, '[ \t\n\r]+')) AS word,
        |           generate_subscripts(string_split_regex(text, '[ \t\n\r]+'), 1) AS pos
        |    FROM q6) WHERE word <> ''),
        |step(doc_id, pos, word, at, toks, failed) AS (
        |  SELECT doc_id, pos, word, 0, []::VARCHAR[], false FROM w
        |  UNION ALL
        |  SELECT s.doc_id, s.pos, s.word,
        |    CASE WHEN m.mlen IS NULL THEN length(s.word) ELSE s.at + m.mlen END,
        |    CASE WHEN m.mlen IS NULL THEN ['[UNK]'] ELSE list_append(s.toks, m.mpiece) END,
        |    m.mlen IS NULL
        |  FROM step s LEFT JOIN LATERAL (
        |    SELECT length(body) AS mlen, piece AS mpiece FROM v
        |    WHERE v.cont = (s.at > 0)
        |      AND substr(s.word, s.at + 1, length(body)) = body
        |    ORDER BY length(body) DESC LIMIT 1) m ON true
        |  WHERE s.at < length(s.word) AND NOT s.failed),
        |tok AS (SELECT doc_id, pos, toks FROM step WHERE at >= length(word)),
        |agg AS (SELECT doc_id, flatten(list(toks ORDER BY pos)) AS ft
        |        FROM tok GROUP BY 1),
        |tokd AS (SELECT q6.doc_id, q6.lang, q6.source,
        |           coalesce(len(a.ft), 0)::BIGINT AS n_tok,
        |           coalesce(len(list_filter(a.ft, x -> x = '[UNK]')), 0)::BIGINT AS n_unk
        |         FROM q6 LEFT JOIN agg a ON q6.doc_id = a.doc_id),
        |nz AS (SELECT doc_id, n_tok AS n FROM tokd WHERE n_tok > 0),
        |cps AS (SELECT doc_id, n,
        |        CAST(SUM(n) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
        |             AS BIGINT) AS e
        |      FROM nz),
        |sps AS (SELECT doc_id, e - n AS st, e FROM cps),
        |pp AS (SELECT doc_id,
        |        unnest(range(st // 128, (e - 1) // 128 + 1)) AS pack_id
        |      FROM sps),
        |pr AS (SELECT doc_id, COUNT(*) AS n_pack_rows FROM pp GROUP BY 1)
        |SELECT lang, source, COUNT(*) AS n_docs,
        |  CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
        |  CAST(SUM(n_unk) AS BIGINT) AS n_unk,
        |  CAST(SUM(COALESCE(pr.n_pack_rows, 0)) AS BIGINT) AS n_pack_rows
        |FROM tokd LEFT JOIN pr USING (doc_id)
        |GROUP BY 1, 2""".stripMargin
    },
    "q_dedup_embcos" ->
      """SELECT a.vec_id AS id_l, b.vec_id AS id_r,
        |  list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS cosine
        |FROM embeddings a JOIN embeddings b
        |  ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.3""".stripMargin,
    "q_dedup_embcluster" ->
      """WITH RECURSIVE
        |p AS (SELECT a.vec_id AS u, b.vec_id AS v
        |      FROM embeddings a JOIN embeddings b
        |        ON a.label = b.label AND a.vec_id < b.vec_id
        |      WHERE list_cosine_similarity(a.embedding::DOUBLE[],
        |              b.embedding::DOUBLE[]) >= 0.3),
        |e AS (SELECT u, v FROM p UNION SELECT v, u FROM p),
        |reach(u, v) AS (SELECT u, u FROM (SELECT DISTINCT u FROM e) t
        |                UNION SELECT r.u, ed.v FROM reach r JOIN e ed ON r.v = ed.u),
        |comp AS (SELECT u AS node, MIN(v) AS comp FROM reach GROUP BY u),
        |lab AS (SELECT em.vec_id AS vid, COALESCE(c.comp, em.vec_id) AS cid
        |        FROM embeddings em LEFT JOIN comp c ON em.vec_id = c.node)
        |SELECT vid, cid, COUNT(*) OVER (PARTITION BY cid) AS sz,
        |       CAST(vid = cid AS INT) AS canon
        |FROM lab""".stripMargin,
    "q_dedup_semantic" ->
      """WITH RECURSIVE
        |ctr AS (SELECT vec_id AS ctrid, embedding::DOUBLE[] AS c
        |        FROM embeddings WHERE vec_id < 8),
        |asg AS (SELECT e.vec_id, e.embedding, c.ctrid,
        |          ROW_NUMBER() OVER (PARTITION BY e.vec_id
        |            ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.c)
        |              DESC, c.ctrid) AS rk
        |        FROM embeddings e CROSS JOIN ctr c),
        |cell AS (SELECT vec_id, embedding, ctrid AS cell FROM asg WHERE rk = 1),
        |p AS (SELECT a.vec_id AS u, b.vec_id AS v
        |      FROM cell a JOIN cell b
        |        ON a.cell = b.cell AND a.vec_id < b.vec_id
        |      WHERE list_cosine_similarity(a.embedding::DOUBLE[],
        |              b.embedding::DOUBLE[]) >= 0.3),
        |e AS (SELECT u, v FROM p UNION SELECT v, u FROM p),
        |reach(u, v) AS (SELECT u, u FROM (SELECT DISTINCT u FROM e) t
        |                UNION SELECT r.u, ed.v FROM reach r JOIN e ed ON r.v = ed.u),
        |comp AS (SELECT u AS node, MIN(v) AS comp FROM reach GROUP BY u),
        |lab AS (SELECT em.vec_id AS vid, COALESCE(c.comp, em.vec_id) AS cid
        |        FROM embeddings em LEFT JOIN comp c ON em.vec_id = c.node)
        |SELECT vid, cid, COUNT(*) OVER (PARTITION BY cid) AS sz,
        |       CAST(vid = cid AS INT) AS canon
        |FROM lab""".stripMargin,
    "q_distinct_sketch" ->
      """WITH h AS (SELECT DISTINCT l_returnflag,
        |    ('0x' || substring(md5(l_orderkey::VARCHAR), 1, 15))::BIGINT AS hv
        |  FROM lineitem),
        |r AS (SELECT l_returnflag, hv,
        |    ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY hv) AS rn,
        |    COUNT(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM h)
        |SELECT l_returnflag,
        |  ROUND(CASE WHEN MAX(n) < 256 THEN MAX(n)::DOUBLE
        |    ELSE 255.0 * 1152921504606846976.0 /
        |      (MAX(CASE WHEN rn = 256 THEN hv END)::DOUBLE) END, 6) + 0.0
        |    AS n_distinct_est
        |FROM r GROUP BY l_returnflag""".stripMargin,
    // the union of slice sketches IS the whole-corpus sketch (the k
    // smallest distinct hashes of A∪B are computable from the k smallest
    // of A and of B), so the oracle is the same single-pass sketch
    "q_distinct_sketch_merge" ->
      """WITH h AS (SELECT DISTINCT l_returnflag,
        |    ('0x' || substring(md5(l_orderkey::VARCHAR), 1, 15))::BIGINT AS hv
        |  FROM lineitem),
        |r AS (SELECT l_returnflag, hv,
        |    ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY hv) AS rn,
        |    COUNT(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM h)
        |SELECT l_returnflag,
        |  ROUND(CASE WHEN MAX(n) < 256 THEN MAX(n)::DOUBLE
        |    ELSE 255.0 * 1152921504606846976.0 /
        |      (MAX(CASE WHEN rn = 256 THEN hv END)::DOUBLE) END, 6) + 0.0
        |    AS n_distinct_est
        |FROM r GROUP BY l_returnflag""".stripMargin,
    // bottom-k-by-hash sample: same md5 ranks in SQL, k smallest per
    // group, then the identical linear interpolation — the merge query's
    // oracle is the SAME single-pass sketch (lossless rollup)
    "q_quantile_sketch" ->
      """WITH rk AS (SELECT l_returnflag AS g, l_extendedprice::DOUBLE AS v,
        |    ('0x' || substring(md5(l_orderkey::VARCHAR || '|' || l_linenumber::VARCHAR || '|' || l_partkey::VARCHAR || '|' || l_suppkey::VARCHAR), 1, 15))::BIGINT AS r
        |  FROM lineitem),
        |s AS (SELECT g, v, ROW_NUMBER() OVER (PARTITION BY g ORDER BY r, v) AS rn FROM rk),
        |kk AS (SELECT g, list_sort(list(v)) AS vals, COUNT(*) AS n
        |       FROM s WHERE rn <= 64 GROUP BY g)
        |SELECT g AS l_returnflag, n::BIGINT AS n_sample,
        |  ROUND(CASE WHEN n = 1 THEN vals[1] ELSE
        |    vals[CAST(FLOOR(0.25::DOUBLE*(n-1)) AS INT)+1] * (1 - (0.25::DOUBLE*(n-1) - FLOOR(0.25::DOUBLE*(n-1))))
        |    + vals[LEAST(CAST(FLOOR(0.25::DOUBLE*(n-1)) AS INT)+2, n::INT)] * (0.25::DOUBLE*(n-1) - FLOOR(0.25::DOUBLE*(n-1))) END + 1e-9, 6) + 0.0 AS p25,
        |  ROUND(CASE WHEN n = 1 THEN vals[1] ELSE
        |    vals[CAST(FLOOR(0.5::DOUBLE*(n-1)) AS INT)+1] * (1 - (0.5::DOUBLE*(n-1) - FLOOR(0.5::DOUBLE*(n-1))))
        |    + vals[LEAST(CAST(FLOOR(0.5::DOUBLE*(n-1)) AS INT)+2, n::INT)] * (0.5::DOUBLE*(n-1) - FLOOR(0.5::DOUBLE*(n-1))) END + 1e-9, 6) + 0.0 AS p50,
        |  ROUND(CASE WHEN n = 1 THEN vals[1] ELSE
        |    vals[CAST(FLOOR(0.75::DOUBLE*(n-1)) AS INT)+1] * (1 - (0.75::DOUBLE*(n-1) - FLOOR(0.75::DOUBLE*(n-1))))
        |    + vals[LEAST(CAST(FLOOR(0.75::DOUBLE*(n-1)) AS INT)+2, n::INT)] * (0.75::DOUBLE*(n-1) - FLOOR(0.75::DOUBLE*(n-1))) END + 1e-9, 6) + 0.0 AS p75,
        |  ROUND(CASE WHEN n = 1 THEN vals[1] ELSE
        |    vals[CAST(FLOOR(0.9::DOUBLE*(n-1)) AS INT)+1] * (1 - (0.9::DOUBLE*(n-1) - FLOOR(0.9::DOUBLE*(n-1))))
        |    + vals[LEAST(CAST(FLOOR(0.9::DOUBLE*(n-1)) AS INT)+2, n::INT)] * (0.9::DOUBLE*(n-1) - FLOOR(0.9::DOUBLE*(n-1))) END + 1e-9, 6) + 0.0 AS p90
        |FROM kk""".stripMargin,
    "q_quantile_sketch_merge" ->
      """WITH rk AS (SELECT l_returnflag AS g, l_extendedprice::DOUBLE AS v,
        |    ('0x' || substring(md5(l_orderkey::VARCHAR || '|' || l_linenumber::VARCHAR || '|' || l_partkey::VARCHAR || '|' || l_suppkey::VARCHAR), 1, 15))::BIGINT AS r
        |  FROM lineitem),
        |s AS (SELECT g, v, ROW_NUMBER() OVER (PARTITION BY g ORDER BY r, v) AS rn FROM rk),
        |kk AS (SELECT g, list_sort(list(v)) AS vals, COUNT(*) AS n
        |       FROM s WHERE rn <= 64 GROUP BY g)
        |SELECT g AS l_returnflag, n::BIGINT AS n_sample,
        |  ROUND(CASE WHEN n = 1 THEN vals[1] ELSE
        |    vals[CAST(FLOOR(0.25::DOUBLE*(n-1)) AS INT)+1] * (1 - (0.25::DOUBLE*(n-1) - FLOOR(0.25::DOUBLE*(n-1))))
        |    + vals[LEAST(CAST(FLOOR(0.25::DOUBLE*(n-1)) AS INT)+2, n::INT)] * (0.25::DOUBLE*(n-1) - FLOOR(0.25::DOUBLE*(n-1))) END + 1e-9, 6) + 0.0 AS p25,
        |  ROUND(CASE WHEN n = 1 THEN vals[1] ELSE
        |    vals[CAST(FLOOR(0.5::DOUBLE*(n-1)) AS INT)+1] * (1 - (0.5::DOUBLE*(n-1) - FLOOR(0.5::DOUBLE*(n-1))))
        |    + vals[LEAST(CAST(FLOOR(0.5::DOUBLE*(n-1)) AS INT)+2, n::INT)] * (0.5::DOUBLE*(n-1) - FLOOR(0.5::DOUBLE*(n-1))) END + 1e-9, 6) + 0.0 AS p50,
        |  ROUND(CASE WHEN n = 1 THEN vals[1] ELSE
        |    vals[CAST(FLOOR(0.75::DOUBLE*(n-1)) AS INT)+1] * (1 - (0.75::DOUBLE*(n-1) - FLOOR(0.75::DOUBLE*(n-1))))
        |    + vals[LEAST(CAST(FLOOR(0.75::DOUBLE*(n-1)) AS INT)+2, n::INT)] * (0.75::DOUBLE*(n-1) - FLOOR(0.75::DOUBLE*(n-1))) END + 1e-9, 6) + 0.0 AS p75,
        |  ROUND(CASE WHEN n = 1 THEN vals[1] ELSE
        |    vals[CAST(FLOOR(0.9::DOUBLE*(n-1)) AS INT)+1] * (1 - (0.9::DOUBLE*(n-1) - FLOOR(0.9::DOUBLE*(n-1))))
        |    + vals[LEAST(CAST(FLOOR(0.9::DOUBLE*(n-1)) AS INT)+2, n::INT)] * (0.9::DOUBLE*(n-1) - FLOOR(0.9::DOUBLE*(n-1))) END + 1e-9, 6) + 0.0 AS p90
        |FROM kk""".stripMargin,
    "q_cms_tokens" ->
      s"""WITH tok AS (SELECT unnest($ToksExpr) AS token FROM documents),
        |c AS (SELECT token, COUNT(*) AS exact_cnt FROM tok GROUP BY 1),
        |top AS (SELECT token, exact_cnt FROM c
        |        ORDER BY exact_cnt DESC, token LIMIT 20),
        |cell AS (SELECT t.d AS depth,
        |    ('0x' || substring(md5(t.d::VARCHAR || '#' || token), 1, 15))::BIGINT
        |      % 2048 AS bucket,
        |    COUNT(*) AS cnt
        |  FROM tok CROSS JOIN generate_series(0, 3) t(d) GROUP BY 1, 2),
        |probe AS (SELECT top.token, top.exact_cnt, t.d AS depth,
        |    ('0x' || substring(md5(t.d::VARCHAR || '#' || top.token), 1, 15))::BIGINT
        |      % 2048 AS bucket
        |  FROM top CROSS JOIN generate_series(0, 3) t(d))
        |SELECT probe.token, probe.exact_cnt,
        |  MIN(COALESCE(cell.cnt, 0)) AS cms_est
        |FROM probe LEFT JOIN cell USING (depth, bucket)
        |GROUP BY 1, 2""".stripMargin,
    "q_rand_proj" ->
      """WITH e AS (SELECT vec_id,
        |    unnest(range(1, len(embedding) + 1)) AS i,
        |    unnest(embedding)::DOUBLE AS v
        |  FROM embeddings WHERE embedding IS NOT NULL),
        |m AS (SELECT ii.i, jj.j,
        |    CASE WHEN ('0x' || substring(md5(
        |        '42:' || (ii.i - 1)::VARCHAR || ':' || jj.j::VARCHAR), 1, 1))::INT
        |        % 2 = 0
        |      THEN 1.0 ELSE -1.0 END AS sgn
        |  FROM generate_series(1, 64) ii(i)
        |  CROSS JOIN generate_series(0, 7) jj(j)),
        |p AS (SELECT e.vec_id, m.j, SUM(e.v * m.sgn) / sqrt(8.0) AS pv
        |  FROM e JOIN m ON m.i = e.i GROUP BY 1, 2)
        |SELECT vec_id, (j + 1)::BIGINT AS dim, ROUND(pv + 1e-9, 6) + 0.0 AS p
        |FROM p""".stripMargin,
    "q_quantize" ->
      """WITH m AS (SELECT vec_id, embedding,
        |    GREATEST(COALESCE(list_max(
        |      list_transform(embedding, x -> abs(x::DOUBLE))), 0), 0) / 127
        |      AS scale
        |  FROM embeddings WHERE embedding IS NOT NULL),
        |e AS (SELECT vec_id, scale,
        |        unnest(range(1, len(embedding) + 1)) AS dim,
        |        unnest(embedding) AS v
        |      FROM m)
        |SELECT vec_id, dim,
        |  CASE WHEN scale = 0 THEN 0
        |    ELSE CAST(LEAST(GREATEST(ROUND(v::DOUBLE / scale), -127), 127)
        |         AS INT) END AS q,
        |  scale
        |FROM e""".stripMargin,
    "q_ann_q8" ->
      """WITH m AS (SELECT vec_id, embedding,
        |    GREATEST(COALESCE(list_max(
        |      list_transform(embedding, x -> abs(x::DOUBLE))), 0), 0) / 127
        |      AS scale
        |  FROM embeddings WHERE embedding IS NOT NULL),
        |e AS (SELECT vec_id, scale,
        |        unnest(range(1, len(embedding) + 1)) AS dim,
        |        unnest(embedding) AS v
        |      FROM m),
        |codes AS (SELECT vec_id, dim,
        |    CASE WHEN scale = 0 THEN 0
        |      ELSE CAST(LEAST(GREATEST(ROUND(v::DOUBLE / scale), -127), 127)
        |           AS INT) END AS q
        |  FROM e),
        |ss AS (SELECT vec_id, CAST(SUM(q * q) AS BIGINT) AS ss
        |       FROM codes GROUP BY 1),
        |d AS (SELECT a.vec_id AS qid, b.vec_id AS nid,
        |        CAST(SUM(a.q * b.q) AS BIGINT) AS d
        |      FROM codes a JOIN codes b USING (dim)
        |      WHERE a.vec_id < 10 AND b.vec_id <> a.vec_id GROUP BY 1, 2),
        |sc AS (SELECT qid, nid,
        |         CASE WHEN sa.ss = 0 OR sb.ss = 0 THEN 0.0
        |           ELSE d::DOUBLE / (sqrt(sa.ss::DOUBLE) * sqrt(sb.ss::DOUBLE))
        |         END AS cos
        |       FROM d JOIN ss sa ON sa.vec_id = d.qid
        |              JOIN ss sb ON sb.vec_id = d.nid),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
        |        ORDER BY cos DESC, nid) AS rn FROM sc)
        |SELECT qid AS query_id, nid AS neighbor_id, cos AS cosine, rn AS rank
        |FROM r WHERE rn <= 5""".stripMargin,
    "q_l2norm" ->
      """WITH n AS (SELECT vec_id, embedding::DOUBLE[] AS v,
        |             sqrt(list_sum([x * x FOR x IN embedding::DOUBLE[]])) AS nrm
        |           FROM embeddings WHERE embedding IS NOT NULL),
        |e AS (SELECT vec_id,
        |        unnest(range(1, len(v) + 1)) AS dim,
        |        unnest(v) AS x, nrm
        |      FROM n WHERE nrm > 0)
        |SELECT vec_id, CAST(dim AS BIGINT) AS dim,
        |       ROUND(x / nrm + 1e-9, 6) + 0.0 AS comp
        |FROM e""".stripMargin,
    "q_centroid" ->
      """WITH e AS (SELECT label,
        |             unnest(range(1, len(embedding) + 1)) AS dim,
        |             unnest(embedding) AS v
        |           FROM embeddings WHERE embedding IS NOT NULL)
        |SELECT label, dim, ROUND(AVG(v::DOUBLE) + 1e-9, 6) + 0.0 AS mean
        |FROM e GROUP BY 1, 2""".stripMargin,
    "q_ann_topk" ->
      """WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 10),
        |s AS (SELECT q.qid, c.vec_id AS nid,
        |        list_cosine_similarity(q.qv::DOUBLE[], c.embedding::DOUBLE[]) AS cos
        |      FROM q CROSS JOIN embeddings c WHERE c.vec_id <> q.qid),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rn FROM s)
        |SELECT qid AS query_id, nid AS neighbor_id,
        |  ROUND(cos + 1e-9, 6) + 0.0 AS cosine, rn AS rank
        |FROM r WHERE rn <= 5""".stripMargin,
    "q_ann_ivf" ->
      """WITH cent AS (SELECT vec_id AS cell, embedding::DOUBLE[] AS cv
        |              FROM embeddings WHERE vec_id < 16),
        |asg AS (
        |  SELECT e.vec_id, e.embedding, c.cell,
        |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
        |      ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.cv) DESC,
        |               c.cell) AS rn
        |  FROM embeddings e CROSS JOIN cent c),
        |corp AS (SELECT vec_id, embedding, cell FROM asg WHERE rn = 1),
        |qp AS (
        |  SELECT e.vec_id AS qid, e.embedding AS qv, c.cell,
        |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
        |      ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.cv) DESC,
        |               c.cell) AS rn
        |  FROM embeddings e CROSS JOIN cent c WHERE e.vec_id < 10),
        |pr AS (SELECT qid, qv, cell FROM qp WHERE rn <= 4),
        |s AS (SELECT pr.qid, corp.vec_id AS nid,
        |        list_cosine_similarity(pr.qv::DOUBLE[], corp.embedding::DOUBLE[]) AS cos
        |      FROM pr JOIN corp ON pr.cell = corp.cell AND corp.vec_id <> pr.qid),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
        |        ORDER BY cos DESC, nid) AS rn FROM s)
        |SELECT qid AS query_id, nid AS neighbor_id,
        |  ROUND(cos + 1e-9, 6) + 0.0 AS cosine, rn AS rank
        |FROM r WHERE rn <= 5""".stripMargin,
    "q_ann_pq" ->
      s"""$PqCte,
        |adc AS (SELECT qd.vec_id AS query_id, nc.vec_id AS neighbor_id,
        |    CAST(sum(qd.dist) AS BIGINT) AS adist
        |  FROM fdist qd JOIN fcodes nc ON qd.s = nc.s AND qd.code = nc.code
        |  WHERE qd.vec_id < 10 AND nc.vec_id <> qd.vec_id
        |  GROUP BY 1, 2),
        |pqr AS (SELECT query_id, neighbor_id, adist,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY adist, neighbor_id) AS rank
        |  FROM adc)
        |SELECT query_id, neighbor_id, adist, rank
        |FROM pqr WHERE rank <= 5""".stripMargin,
    "q_ann_ivfpq" -> IvfPqOracle,
    // the layout round-trip re-reads the SAME index from the
    // partitioned sink — result equality against the identical replay
    // proves the persisted form lossless
    "q_ann_layout" -> IvfPqOracle,
    "q_ann_recall" -> AnnRecallOracle,
    // production-bit-width PQ: the 256-code training replay (the same
    // integer Lloyd CTE, ksub parameterized) + brute ADC top-10 + the
    // exact baseline + integer intersection
    "q_ann_pq256" ->
      s"""${pqCteOn("TRUE", ksub = 256, px = "h")},
        |hexs AS (SELECT q.vec_id AS qid, c.vec_id AS nid,
        |    list_cosine_similarity(q.embedding::DOUBLE[],
        |      c.embedding::DOUBLE[]) AS cos
        |  FROM embeddings q CROSS JOIN embeddings c
        |  WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id),
        |hex AS (SELECT qid, nid FROM (
        |    SELECT qid, nid, ROW_NUMBER() OVER (PARTITION BY qid
        |      ORDER BY cos DESC, nid) AS rn FROM hexs) WHERE rn <= 10),
        |hadc AS (SELECT qd.vec_id AS qid, nc.vec_id AS nid,
        |    CAST(sum(qd.dist) AS BIGINT) AS adist
        |  FROM hfdist qd JOIN hfcodes nc ON qd.s = nc.s AND qd.code = nc.code
        |  WHERE qd.vec_id < 10 AND nc.vec_id <> qd.vec_id
        |  GROUP BY 1, 2),
        |hb AS (SELECT qid, nid FROM (
        |    SELECT qid, nid, row_number() OVER (PARTITION BY qid
        |      ORDER BY adist, nid) AS rn FROM hadc) WHERE rn <= 10),
        |hrec AS (SELECT 'pq256' AS method,
        |    (SELECT count(*) FROM hb a JOIN hex USING (qid, nid)) AS hits,
        |    (SELECT count(*) FROM hex) AS possible)
        |SELECT method, hits, possible,
        |  hits::DOUBLE / possible AS recall
        |FROM hrec""".stripMargin,
    "q_ann_ivfpq_res" -> IvfPqResOracle,
    "q_ann_layout_append" -> LayoutAppendOracle,
    // compaction must be row-invisible: the compacted index's probed
    // search replays exactly like the append query's (train on base,
    // encode everything, search the union)
    "q_ann_layout_compact" -> LayoutAppendOracle,
    "q_ann_advise" -> AnnAdviseOracle,
    "q_lsh_advise" -> LshAdviseOracle,
    "q_dedup_semantic_stream" ->
      """WITH cent AS (SELECT embedding::DOUBLE[] AS cv,
        |    row_number() OVER (ORDER BY vec_id) - 1 AS cell
        |  FROM (SELECT vec_id, embedding FROM embeddings
        |        WHERE vec_id % 2 = 0 ORDER BY vec_id LIMIT 8)),
        |corpa AS (SELECT e.vec_id, e.embedding, c.cell,
        |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
        |      ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.cv) DESC,
        |               c.cell) AS rn
        |  FROM embeddings e CROSS JOIN cent c
        |  WHERE e.vec_id % 2 = 0 AND e.embedding IS NOT NULL),
        |corp AS (SELECT vec_id, embedding, cell FROM corpa WHERE rn = 1),
        |qp AS (SELECT e.vec_id, e.embedding, c.cell,
        |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
        |      ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.cv) DESC,
        |               c.cell) AS rn
        |  FROM embeddings e CROSS JOIN cent c
        |  WHERE e.vec_id % 2 <> 0 AND e.embedding IS NOT NULL),
        |pr AS (SELECT vec_id AS id_s, embedding AS qv, cell FROM qp
        |       WHERE rn <= 2),
        |sc AS (SELECT pr.id_s, corp.vec_id AS id_c,
        |        list_cosine_similarity(pr.qv::DOUBLE[],
        |          corp.embedding::DOUBLE[]) AS cos
        |      FROM pr JOIN corp ON pr.cell = corp.cell)
        |SELECT id_s, id_c, ROUND(cos + 1e-9, 6) + 0.0 AS cosine
        |FROM sc WHERE cos >= 0.3""".stripMargin,
    "q_ann_ivf_trained" ->
      s"""$KMeansCte,
         |tcent AS (SELECT cluster AS cell, list(v::DOUBLE ORDER BY d) AS cv
         |          FROM c3 GROUP BY cluster),
         |tasg AS (SELECT e.vec_id, e.embedding, c.cell,
         |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |      ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.cv) DESC,
         |               c.cell) AS trn
         |  FROM embeddings e CROSS JOIN tcent c
         |  WHERE e.embedding IS NOT NULL),
         |tcorp AS (SELECT vec_id, embedding, cell FROM tasg WHERE trn = 1),
         |tpr AS (SELECT vec_id AS qid, embedding AS qv, cell FROM tasg
         |        WHERE vec_id < 10 AND trn <= 2),
         |ts AS (SELECT tpr.qid, tcorp.vec_id AS nid,
         |        list_cosine_similarity(tpr.qv::DOUBLE[],
         |          tcorp.embedding::DOUBLE[]) AS cos
         |      FROM tpr JOIN tcorp
         |        ON tpr.cell = tcorp.cell AND tcorp.vec_id <> tpr.qid),
         |tr AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
         |        ORDER BY cos DESC, nid) AS rn2 FROM ts)
         |SELECT qid AS query_id, nid AS neighbor_id,
         |  ROUND(cos + 1e-9, 6) + 0.0 AS cosine, rn2 AS rank
         |FROM tr WHERE rn2 <= 5""".stripMargin,
    "q_hybrid_rrf" ->
      s"""WITH tk AS (SELECT doc_id, list_distinct($ToksExpr) AS toks
        |           FROM documents),
        |ev AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        |       WHERE embedding IS NOT NULL),
        |c AS (SELECT doc_id, toks, v FROM tk JOIN ev ON doc_id = vec_id),
        |sd AS (SELECT doc_id AS qid, toks AS qtoks, v AS qv
        |       FROM c WHERE doc_id < 5),
        |p AS (SELECT sd.qid, c.doc_id AS did,
        |    CASE WHEN len(list_distinct(c.toks || sd.qtoks)) = 0 THEN 0.0
        |      ELSE len(list_intersect(c.toks, sd.qtoks))::DOUBLE
        |        / len(list_distinct(c.toks || sd.qtoks)) END AS jacc,
        |    list_cosine_similarity(c.v, sd.qv) AS cos
        |  FROM sd JOIN c ON c.doc_id <> sd.qid),
        |r AS (SELECT qid, did,
        |    row_number() OVER (PARTITION BY qid ORDER BY jacc DESC, did) AS lrank,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, did) AS srank
        |  FROM p),
        |f AS (SELECT qid, did,
        |    1000000000000 // (60 + lrank) + 1000000000000 // (60 + srank)
        |      AS rrf_score
        |  FROM r),
        |fr AS (SELECT qid, did, rrf_score,
        |    row_number() OVER (PARTITION BY qid
        |      ORDER BY rrf_score DESC, did) AS rank
        |  FROM f)
        |SELECT qid AS query_id, did AS doc_id,
        |  CAST(rrf_score AS BIGINT) AS rrf_score, rank
        |FROM fr WHERE rank <= 10""".stripMargin,
    "q_hybrid_rrf_blocked" ->
      s"""WITH dd AS (SELECT doc_id, $ToksExpr AS tk FROM documents),
        |g AS (SELECT doc_id, list_distinct(
        |        [list_aggregate(tk[i:i+2], 'string_agg', ' ')
        |         FOR i IN range(1, greatest(len(tk) - 2, 1) + 1)]) AS sh FROM dd),
        |bt AS (SELECT * FROM g WHERE doc_id < 5),
        |cp AS (SELECT * FROM g WHERE doc_id >= 5),
        |lexp AS (SELECT bt.doc_id AS qid, cp.doc_id AS did,
        |    len(list_intersect(bt.sh, cp.sh))::DOUBLE
        |      / (len(bt.sh) + len(cp.sh)
        |         - len(list_intersect(bt.sh, cp.sh))) AS jacc
        |  FROM bt JOIN cp ON true),
        |lex AS (SELECT qid, did,
        |    row_number() OVER (PARTITION BY qid
        |      ORDER BY jacc DESC, did) AS lrank
        |  FROM lexp WHERE jacc >= 0.8),
        |cent AS (SELECT embedding::DOUBLE[] AS cv,
        |    row_number() OVER (ORDER BY vec_id) - 1 AS cell
        |  FROM (SELECT vec_id, embedding FROM embeddings
        |        WHERE vec_id >= 5 ORDER BY vec_id LIMIT 16)),
        |casg AS (SELECT e.vec_id, e.embedding, c.cell,
        |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
        |      ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.cv) DESC,
        |               c.cell) AS rn
        |  FROM embeddings e CROSS JOIN cent c
        |  WHERE e.embedding IS NOT NULL),
        |corp AS (SELECT vec_id, embedding, cell FROM casg
        |         WHERE vec_id >= 5 AND rn = 1),
        |qp AS (SELECT vec_id AS qid, embedding AS qv, cell FROM casg
        |       WHERE vec_id < 5 AND rn <= 4),
        |semc AS (SELECT qp.qid, corp.vec_id AS did,
        |    list_cosine_similarity(qp.qv::DOUBLE[],
        |      corp.embedding::DOUBLE[]) AS cos
        |  FROM qp JOIN corp ON qp.cell = corp.cell),
        |sem AS (SELECT qid, did,
        |    row_number() OVER (PARTITION BY qid
        |      ORDER BY cos DESC, did) AS srank
        |  FROM semc),
        |contrib AS (
        |  SELECT qid, did, 1000000000000 // (60 + lrank) AS c FROM lex
        |  UNION ALL
        |  SELECT qid, did, 1000000000000 // (60 + srank) FROM sem
        |  WHERE srank <= 20),
        |f AS (SELECT qid, did, CAST(sum(c) AS BIGINT) AS rrf_score
        |      FROM contrib GROUP BY 1, 2),
        |fr AS (SELECT qid, did, rrf_score,
        |    row_number() OVER (PARTITION BY qid
        |      ORDER BY rrf_score DESC, did) AS rank
        |  FROM f)
        |SELECT qid AS query_id, did AS doc_id, rrf_score, rank
        |FROM fr WHERE rank <= 10""".stripMargin,
    "q_topk" ->
      """WITH r AS (SELECT o_orderkey, o_orderpriority, o_totalprice,
        |  ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |    ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |  FROM orders)
        |SELECT o_orderkey, o_orderpriority, o_totalprice, rnk
        |FROM r WHERE rnk <= 3""".stripMargin,
    "q_profile" ->
      """SELECT 'l_orderkey' AS "column", COUNT(*) AS n_rows,
        |  SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_nulls,
        |  COUNT(DISTINCT l_orderkey) AS n_distinct,
        |  MIN(l_orderkey)::VARCHAR AS min_str, MAX(l_orderkey)::VARCHAR AS max_str
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_returnflag', COUNT(*),
        |  SUM(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END)::BIGINT,
        |  COUNT(DISTINCT l_returnflag),
        |  MIN(l_returnflag), MAX(l_returnflag)
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_quantity', COUNT(*),
        |  SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END)::BIGINT,
        |  COUNT(DISTINCT l_quantity),
        |  MIN(l_quantity)::VARCHAR, MAX(l_quantity)::VARCHAR
        |FROM lineitem""".stripMargin,
    "q_skew" ->
      """WITH c AS (SELECT l_suppkey, COUNT(*) AS cnt FROM lineitem GROUP BY 1),
        |t AS (SELECT COUNT(*) AS total FROM lineitem)
        |SELECT l_suppkey, cnt, cnt::DOUBLE / total AS share
        |FROM c CROSS JOIN t
        |ORDER BY cnt DESC, l_suppkey LIMIT 10""".stripMargin,
    "q_bloom_join" ->
      """SELECT l_returnflag AS flag, count(*) AS n, sum(l_quantity) AS qty
        |FROM lineitem
        |WHERE l_orderkey IN (SELECT o_orderkey FROM orders
        |                     WHERE o_orderpriority = '1-URGENT'
        |                       AND o_totalprice > 150000.0)
        |GROUP BY 1""".stripMargin,
    "q_salted_join" ->
      """WITH f AS (SELECT l_returnflag, count(*) AS flag_rows
        |           FROM lineitem GROUP BY 1)
        |SELECT l.l_orderkey AS okey, l.l_linenumber AS lnum,
        |       l.l_returnflag AS flag, f.flag_rows
        |FROM lineitem l JOIN f USING (l_returnflag)""".stripMargin,
    "q_sample_stratified" ->
      """WITH r AS (
        |  SELECT doc_id, lang,
        |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY
        |      ('0x' || substring(md5(CONCAT_WS('#', 7, doc_id)), 1, 15))::BIGINT,
        |      doc_id) AS rn
        |  FROM documents)
        |SELECT doc_id, lang FROM r WHERE rn <= 25""".stripMargin,
    "q_sample_mixture" ->
      """WITH q(lang, quota) AS (VALUES ('en', 100), ('de', 40), ('fr', 30),
        |                              ('es', 20), ('zh', 10)),
        |r AS (
        |  SELECT doc_id, lang,
        |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY
        |      ('0x' || substring(md5(CONCAT_WS('#', 7, doc_id)), 1, 15))::BIGINT,
        |      doc_id) AS rn
        |  FROM documents)
        |SELECT r.lang, r.doc_id FROM r JOIN q ON r.lang = q.lang
        |WHERE r.rn <= q.quota""".stripMargin,
    "q_sample_temperature" ->
      """WITH c AS (SELECT lang, COUNT(*)::DOUBLE AS c FROM documents GROUP BY 1),
        |z AS (SELECT SUM(pow(c, 0.5)) AS z FROM c),
        |q AS (SELECT lang,
        |        CAST(LEAST(FLOOR(150 * pow(c.c, 0.5) / z.z), c.c) AS BIGINT)
        |          AS quota
        |      FROM c CROSS JOIN z),
        |r AS (
        |  SELECT doc_id, lang,
        |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY
        |      ('0x' || substring(md5(CONCAT_WS('#', 11, doc_id)), 1, 15))::BIGINT,
        |      doc_id) AS rn
        |  FROM documents)
        |SELECT r.lang, r.doc_id FROM r JOIN q ON r.lang = q.lang
        |WHERE r.rn <= q.quota""".stripMargin,
    "q_token_plan" ->
      """WITH w(source, wt) AS (VALUES ('src0', 0.4), ('src1', 0.3),
        |                             ('src2', 0.2), ('src3', 0.1)),
        |a AS (SELECT source, CAST(SUM(n_chars) AS BIGINT) AS tokens_available
        |      FROM documents GROUP BY 1)
        |SELECT a.source, tokens_available,
        |  CAST(LEAST(FLOOR(50000 * wt), FLOOR(2.0 * tokens_available))
        |       AS BIGINT) AS tokens_allocated,
        |  CAST(LEAST(FLOOR(50000 * wt), FLOOR(2.0 * tokens_available))
        |       AS BIGINT)::DOUBLE / tokens_available AS epochs
        |FROM a JOIN w ON a.source = w.source""".stripMargin,
    "q_dsir" ->
      s"""WITH tk AS (SELECT doc_id, $ToksExpr AS tk FROM documents),
        |uni AS (SELECT doc_id, unnest(tk) AS g FROM tk),
        |bi AS (SELECT doc_id,
        |         unnest(tk[1:len(tk)-1]) || ' ' || unnest(tk[2:len(tk)]) AS g
        |       FROM tk WHERE len(tk) >= 2),
        |gr AS (SELECT * FROM uni UNION ALL SELECT * FROM bi),
        |f AS (SELECT doc_id,
        |        ('0x' || substring(md5('dsir#' || g), 1, 15))::BIGINT % 2048 AS b,
        |        COUNT(*) AS c
        |      FROM gr GROUP BY 1, 2),
        |tgt AS (SELECT b, SUM(c) AS tc FROM f WHERE doc_id % 7 = 0 GROUP BY 1),
        |rw  AS (SELECT b, SUM(c) AS rc FROM f WHERE doc_id % 7 <> 0 GROUP BY 1),
        |tt AS (SELECT COALESCE(SUM(c), 0) AS t FROM f WHERE doc_id % 7 = 0),
        |rt AS (SELECT COALESCE(SUM(c), 0) AS r FROM f WHERE doc_id % 7 <> 0),
        |w AS (SELECT f.doc_id, SUM(c) AS n_feats,
        |        SUM(c * (ln((COALESCE(tc, 0) + 1.0) / (t + 1.0 * 2048))
        |               - ln((COALESCE(rc, 0) + 1.0) / (r + 1.0 * 2048)))) AS lw
        |      FROM f LEFT JOIN tgt USING (b) LEFT JOIN rw USING (b)
        |        CROSS JOIN tt CROSS JOIN rt
        |      WHERE f.doc_id % 7 <> 0 GROUP BY 1),
        |sel AS (SELECT doc_id, n_feats, lw,
        |          lw - ln(-ln(
        |            (('0x' || substring(md5(CONCAT_WS('#', 42, doc_id)), 1, 15))::BIGINT
        |              + 1.0) / 1152921504606846977.0)) AS key
        |        FROM w)
        |SELECT doc_id AS did, n_feats::BIGINT AS n_feats,
        |       ROUND(lw + 1e-9, 6) + 0.0 AS log_weight
        |FROM sel ORDER BY key DESC, doc_id LIMIT 100""".stripMargin,
    "q_token_sample" ->
      """WITH q(source, quota) AS (VALUES ('src0', 5000), ('src1', 3000)),
        |r AS (SELECT source, doc_id, n_chars, quota,
        |        COALESCE(SUM(n_chars) OVER (PARTITION BY source ORDER BY
        |          ('0x' || substring(md5(CONCAT_WS('#', 7, doc_id)), 1, 15))::BIGINT,
        |          doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre
        |      FROM documents JOIN q USING (source))
        |SELECT source, doc_id, n_chars FROM r WHERE pre < quota""".stripMargin,
    "q_sample_split" ->
      """SELECT doc_id,
        |  CASE WHEN u < 0.75 THEN 0 WHEN u < 0.875 THEN 1 ELSE 2 END AS split
        |FROM (SELECT doc_id,
        |        (('0x' || substring(md5(CONCAT_WS('#', 7, doc_id)), 1, 15))::BIGINT)::DOUBLE
        |          / 1152921504606846976.0 AS u
        |      FROM documents)""".stripMargin,
    "q_split_bykey" ->
      """SELECT doc_id,
        |  CASE WHEN u < 0.8 THEN 0 WHEN u < 0.9 THEN 1 ELSE 2 END AS split
        |FROM (SELECT doc_id,
        |        (('0x' || substring(md5(CONCAT_WS('#', 7, md5(text))), 1, 15))::BIGINT)::DOUBLE
        |          / 1152921504606846976.0 AS u
        |      FROM documents)""".stripMargin,
    "q_top_tokens" ->
      s"""WITH tok AS (SELECT lang, unnest($ToksExpr) AS token FROM documents),
        |c AS (SELECT lang, token, count(*) AS cnt FROM tok GROUP BY 1, 2),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
        |        ORDER BY cnt DESC, token) AS rank FROM c)
        |SELECT lang, token, cnt, rank FROM r WHERE rank <= 10""".stripMargin,
    "q_lm_score" ->
      s"""WITH t AS (SELECT doc_id, $ToksExpr AS tk FROM documents),
        |pr AS (SELECT doc_id, unnest(tk[1:len(tk)-1]) AS w1,
        |              unnest(tk[2:len(tk)]) AS w2
        |       FROM t WHERE len(tk) >= 2),
        |bc AS (SELECT w1, w2, COUNT(*) AS c12 FROM pr GROUP BY 1, 2),
        |cc AS (SELECT w1, COUNT(*) AS c1 FROM pr GROUP BY 1),
        |v AS (SELECT COUNT(DISTINCT w) AS vs
        |      FROM (SELECT unnest(tk) AS w FROM t) u),
        |sc AS (SELECT pr.doc_id,
        |         ln((bc.c12 + 1.0) / (cc.c1 + 1.0 * vs)) AS lp
        |       FROM pr JOIN bc USING (w1, w2) JOIN cc USING (w1) CROSS JOIN v)
        |SELECT doc_id AS did, COUNT(*) AS n_bigrams,
        |       ROUND(AVG(lp) + 1e-9, 6) + 0.0 AS avg_logprob
        |FROM sc GROUP BY 1""".stripMargin,
    "q_url_blocklist" ->
      // same synthesized urls, same host/registrable-domain extraction
      // as the q_url_normalize oracle; survivors = hosts whose host AND
      // registrable domain miss the 3-entry blocklist
      """WITH syn AS (SELECT doc_id,
        |    (CASE doc_id % 3 WHEN 0 THEN 'HTTP://' WHEN 1 THEN 'https://' ELSE 'http://' END)
        |    || (CASE doc_id % 4 WHEN 0 THEN 'WWW.News' WHEN 1 THEN 'blog.Site' WHEN 2 THEN 'cdn.media' ELSE 'Docs.Portal' END)
        |    || (CASE doc_id % 5 WHEN 0 THEN '.com' WHEN 1 THEN '.co.uk' WHEN 2 THEN '.org' WHEN 3 THEN '.com.au' ELSE '.io' END)
        |    || (CASE WHEN doc_id % 11 = 0 THEN '/' ELSE '/p/' || doc_id::VARCHAR END) AS url
        |  FROM documents),
        |h AS (SELECT doc_id,
        |    lower(regexp_extract(trim(url), '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/:?#]+)', 1)) AS host
        |  FROM syn),
        |hd AS (SELECT doc_id, host,
        |    CASE WHEN regexp_matches(host, '\.(co|com|net|org|ac|gov|edu)\.[a-z][a-z]$')
        |              AND regexp_extract(host, '([^.]+\.[^.]+\.[^.]+)$', 1) <> ''
        |         THEN regexp_extract(host, '([^.]+\.[^.]+\.[^.]+)$', 1)
        |         WHEN regexp_extract(host, '([^.]+\.[^.]+)$', 1) <> ''
        |         THEN regexp_extract(host, '([^.]+\.[^.]+)$', 1)
        |         ELSE host END AS dom
        |  FROM h),
        |bl(entry) AS (VALUES ('site.co.uk'), ('cdn.media.org'), ('news.com'))
        |SELECT doc_id, host FROM hd
        |WHERE NOT EXISTS (SELECT 1 FROM bl WHERE bl.entry = hd.host)
        |  AND NOT EXISTS (SELECT 1 FROM bl WHERE bl.entry = hd.dom)""".stripMargin,
    "q_zorder" ->
      // same bucket-width normalization (Long floor division) + bit
      // interleave: bit i of dim j lands at i*2 + j. Exact integers.
      """WITH b AS (SELECT min(user_id) AS mn0, max(user_id) AS mx0,
        |             min(epoch_us(ts)) AS mn1, max(epoch_us(ts)) AS mx1
        |           FROM events),
        |c AS (SELECT e.event_id,
        |    CASE WHEN b.mx0 - b.mn0 <= 0 THEN 0
        |         ELSE (e.user_id - b.mn0) // ((b.mx0 - b.mn0) // 65536 + 1)
        |    END AS c0,
        |    CASE WHEN b.mx1 - b.mn1 <= 0 THEN 0
        |         ELSE (epoch_us(e.ts) - b.mn1) // ((b.mx1 - b.mn1) // 65536 + 1)
        |    END AS c1
        |  FROM events e, b)
        |SELECT event_id,
        |  list_sum([(((c0 >> i) & 1) << (2 * i)) +
        |            (((c1 >> i) & 1) << (2 * i + 1))
        |            FOR i IN range(0, 16)])::BIGINT AS z
        |FROM c""".stripMargin,
    "q_bpe" ->
      s"""$BpeCte
         |SELECT word, freq AS n, array_to_string(syms, ' ') AS syms
         |FROM v3""".stripMargin,
    // encode = each doc's tokens joined to the trained vocab's final
    // symbol rows, re-concatenated in token order (greedy merge order
    // is per-word, so word → v3.syms IS the encode function)
    "q_bpe_encode" ->
      s"""$BpeCte,
         |dt AS (SELECT doc_id, $ToksExpr AS tk FROM documents),
         |dx AS (SELECT doc_id, unnest(tk) AS word,
         |         generate_subscripts(tk, 1) AS pos FROM dt),
         |enc AS (SELECT dx.doc_id,
         |          string_agg(array_to_string(v.syms, ' '), ' '
         |            ORDER BY dx.pos) AS syms
         |        FROM dx JOIN v3 v ON dx.word = v.word GROUP BY dx.doc_id)
         |SELECT d.doc_id, COALESCE(e.syms, '') AS syms
         |FROM documents d LEFT JOIN enc e ON d.doc_id = e.doc_id""".stripMargin,
    "q_salted_sweep" ->
      """WITH l AS (SELECT o_orderkey AS okey,
        |             CASE WHEN o_orderkey % 2 = 0 THEN 0
        |                  ELSE o_orderkey % 997 END AS grp,
        |             (o_orderkey * 13 % 100000) / 10.0 AS s,
        |             (o_orderkey * 13 % 100000) / 10.0
        |               + (o_custkey % 40) / 10.0 AS e
        |           FROM orders),
        |r AS (SELECT o_orderkey AS rid,
        |        CASE WHEN o_orderkey % 2 = 0 THEN 0
        |             ELSE o_orderkey % 997 END AS grp,
        |        (o_orderkey * 31 % 100000) / 10.0 AS p
        |      FROM orders)
        |SELECT l.okey, MIN(r.rid) AS rid
        |FROM l JOIN r ON l.grp = r.grp AND r.p >= l.s AND r.p <= l.e
        |GROUP BY l.okey""".stripMargin,
    "q_auto_sweep" -> AutoSweepOracle,
    // the rule-planned declarative join on the SAME skewed shape must be
    // row-invisible too: one shared replay
    "q_rule_auto_sweep" -> AutoSweepOracle,
    "q_bpe_merges" ->
      s"""$BpeCte
         |SELECT 1::BIGINT AS merge_rank, a AS sym_a, b AS sym_b FROM top1
         |UNION ALL SELECT 2::BIGINT, a, b FROM top2
         |UNION ALL SELECT 3::BIGINT, a, b FROM top3""".stripMargin,
    "q_bpe_wordpiece" -> {
      // trained pieces derived from the unrolled BPE rounds' v3, then
      // the q_wordpiece recursive greedy longest-match walk over them
      val bpe = "WITH RECURSIVE " + BpeCte.stripPrefix("WITH ")
      s"""$bpe,
         |pb AS (SELECT replace(syms[i], '</w>', '') AS body, (i > 1) AS cont
         |  FROM (SELECT syms, unnest(range(1, len(syms) + 1)) AS i FROM v3)),
         |pieces AS (SELECT DISTINCT body, cont FROM pb WHERE body <> ''),
         |v AS (SELECT CASE WHEN cont THEN '##' || body ELSE body END AS piece,
         |        body, cont FROM pieces),
         |w AS (SELECT doc_id, pos, word FROM (
         |    SELECT doc_id, unnest(string_split_regex(text, '[ \t\n\r]+')) AS word,
         |           generate_subscripts(string_split_regex(text, '[ \t\n\r]+'), 1) AS pos
         |    FROM documents) WHERE word <> ''),
         |step(doc_id, pos, word, at, toks, failed) AS (
         |  SELECT doc_id, pos, word, 0, []::VARCHAR[], false FROM w
         |  UNION ALL
         |  SELECT s.doc_id, s.pos, s.word,
         |    CASE WHEN m.mlen IS NULL THEN length(s.word) ELSE s.at + m.mlen END,
         |    CASE WHEN m.mlen IS NULL THEN ['[UNK]'] ELSE list_append(s.toks, m.mpiece) END,
         |    m.mlen IS NULL
         |  FROM step s LEFT JOIN LATERAL (
         |    SELECT length(body) AS mlen, piece AS mpiece FROM v
         |    WHERE v.cont = (s.at > 0)
         |      AND substr(s.word, s.at + 1, length(body)) = body
         |    ORDER BY length(body) DESC LIMIT 1) m ON true
         |  WHERE s.at < length(s.word) AND NOT s.failed),
         |tok AS (SELECT doc_id, pos, toks FROM step WHERE at >= length(word)),
         |agg AS (SELECT doc_id, flatten(list(toks ORDER BY pos)) AS ft
         |        FROM tok GROUP BY 1)
         |SELECT d.doc_id,
         |  array_to_string(coalesce(a.ft, []::VARCHAR[]), ' ') AS tokens_str,
         |  coalesce(len(a.ft), 0)::BIGINT AS n_tokens,
         |  coalesce(len(list_filter(a.ft, x -> x = '[UNK]')), 0)::BIGINT AS n_unk
         |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id""".stripMargin
    },
    "q_labelprop" -> {
      // 3 unrolled synchronous LPA rounds: in-neighbor label counts,
      // winner by (count DESC, label ASC) — GroupedMode's deterministic
      // tie rule — no-in-edge nodes keep their label. Zero tolerance.
      val rounds = (1 to 3).map { k =>
        val p = s"l${k - 1}"
        s"""c$k AS (SELECT e.dst, l.label, count(*) AS c
           |  FROM e JOIN $p l ON e.src = l.node GROUP BY 1, 2),
           |w$k AS (SELECT dst, label,
           |    row_number() OVER (PARTITION BY dst ORDER BY c DESC, label) AS rn
           |  FROM c$k),
           |l$k AS (SELECT l.node, coalesce(w.label, l.label) AS label
           |  FROM $p l LEFT JOIN (SELECT dst, label FROM w$k WHERE rn = 1) w
           |    ON l.node = w.dst)""".stripMargin
      }.mkString(",\n")
      s"""WITH consts AS (SELECT count(*)::BIGINT AS n FROM documents),
         |e AS (SELECT doc_id AS src, (2*doc_id + 1) % (SELECT n FROM consts) AS dst
         |      FROM documents WHERE doc_id % 7 <> 0
         |      UNION ALL
         |      SELECT doc_id, (3*doc_id + 7) % (SELECT n FROM consts)
         |      FROM documents WHERE doc_id % 3 <> 0),
         |l0 AS (SELECT doc_id AS node, doc_id % 50 AS label FROM documents),
         |$rounds
         |SELECT node, label::BIGINT AS label FROM l3""".stripMargin
    },
    "q_changelog" ->
      """SELECT user_id, event_id, ts AS start,
        |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS stop,
        |  event_type
        |FROM events WHERE ts IS NOT NULL""".stripMargin,
    "q_negatives" ->
      // same md5 rank space, 16 slices (shift 56), 12 probes per query:
      // candidate = slice-local nearest-below with wrap to slice max,
      // positives anti-joined, duplicate draws to smallest probe, first
      // 4 survivors in probe order
      """WITH cr AS (SELECT doc_id AS id,
        |    ('0x' || substring(md5(CONCAT_WS('#', 7, doc_id)), 1, 15))::BIGINT AS r
        |  FROM (SELECT DISTINCT doc_id FROM documents)),
        |crb AS (SELECT id, r, r >> 56 AS b FROM cr),
        |q AS (SELECT doc_id AS qid, xor(doc_id, 1) AS pos
        |      FROM documents WHERE doc_id % 17 = 3),
        |p AS (SELECT q.qid, t.j,
        |    ('0x' || substring(md5(CONCAT_WS('#', 7, q.qid, t.j)), 1, 15))::BIGINT AS p
        |  FROM (SELECT DISTINCT qid FROM q) q
        |  CROSS JOIN generate_series(0, 11) t(j)),
        |pb AS (SELECT qid, j, p, p >> 56 AS b FROM p),
        |cand AS (SELECT qid, j, id,
        |    row_number() OVER (PARTITION BY qid, j
        |      ORDER BY (r <= p) DESC, r DESC, id DESC) AS rn
        |  FROM pb JOIN crb USING (b)),
        |c1 AS (SELECT qid, j, id FROM cand WHERE rn = 1),
        |nopos AS (SELECT c1.qid, c1.j, c1.id FROM c1
        |  WHERE NOT EXISTS (SELECT 1 FROM q
        |    WHERE q.qid = c1.qid AND q.pos = c1.id)),
        |dd AS (SELECT qid, j, id,
        |    row_number() OVER (PARTITION BY qid, id ORDER BY j) AS dn
        |  FROM nopos),
        |sl AS (SELECT qid, id,
        |    row_number() OVER (PARTITION BY qid ORDER BY j) AS slot
        |  FROM dd WHERE dn = 1)
        |SELECT qid, id AS neg_id, slot::BIGINT AS slot
        |FROM sl WHERE slot <= 4""".stripMargin,
    "q_mixture" ->
      // ROLLUP with ANSI GROUPING bitmask (Spark grouping_id is
      // bit-compatible: first dim = most significant bit); shares are a
      // single long/long double division, r6m-rounded on both sides
      """WITH t AS (SELECT count(*)::BIGINT AS td,
        |             sum(n_chars)::BIGINT AS tw FROM documents)
        |SELECT lang, source, GROUPING(lang, source)::BIGINT AS level,
        |  count(*)::BIGINT AS n_docs,
        |  coalesce(sum(n_chars), 0)::BIGINT AS weight,
        |  ROUND(count(*)::DOUBLE / (SELECT td FROM t) + 1e-9, 6) + 0.0
        |    AS doc_share,
        |  ROUND(coalesce(sum(n_chars), 0)::DOUBLE / (SELECT tw FROM t)
        |        + 1e-9, 6) + 0.0 AS weight_share
        |FROM documents GROUP BY ROLLUP (lang, source)""".stripMargin,
    "q_lin_score" -> {
      // the model's 64 fixed-point weights inlined verbatim — feature
      // hash is the md5Rank construction, bigrams built 1-indexed, all
      // arithmetic 64-bit integer (zero float tolerance)
      val wlit = LinModel.weights.mkString("[", ", ", "]")
      s"""WITH w AS (SELECT $wlit::BIGINT[] AS wt),
        |d AS (SELECT doc_id, $ToksExpr AS tk FROM documents),
        |f AS (SELECT doc_id,
        |        tk || [tk[i] || ' ' || tk[i + 1] FOR i IN range(1, len(tk))]
        |          AS feats
        |      FROM d),
        |s AS (SELECT doc_id, len(feats)::BIGINT AS n_feats,
        |        500 + coalesce(list_sum(
        |          [wt[1 + ('0x' || substring(md5(CONCAT_WS('#', 11, f)), 1, 15))::BIGINT % 64]
        |           FOR f IN feats]), 0) AS score_fp
        |      FROM f, w)
        |SELECT doc_id AS did, n_feats, score_fp::BIGINT AS score_fp,
        |       score_fp > 0 AS keep
        |FROM s""".stripMargin
    },
    "q_collocations" ->
      s"""WITH t AS (SELECT doc_id, $ToksExpr AS tk FROM documents),
        |pr AS (SELECT unnest(tk[1:len(tk)-1]) AS w1,
        |              unnest(tk[2:len(tk)]) AS w2
        |       FROM t WHERE len(tk) >= 2),
        |bc AS (SELECT w1, w2, COUNT(*) AS np FROM pr GROUP BY 1, 2
        |       HAVING COUNT(*) >= 3),
        |uw AS (SELECT w, COUNT(*) AS nw
        |       FROM (SELECT unnest(tk) AS w FROM t) u GROUP BY 1),
        |tot AS (SELECT (SELECT COUNT(*) FROM pr) AS tp,
        |               (SELECT COUNT(*)
        |                FROM (SELECT unnest(tk) AS w FROM t) x) AS tu),
        |sc AS (SELECT bc.w1, bc.w2, bc.np,
        |         ln((bc.np::DOUBLE * tot.tu::DOUBLE * tot.tu::DOUBLE)
        |            / (tot.tp::DOUBLE * u1.nw::DOUBLE * u2.nw::DOUBLE)) AS pmi0
        |       FROM bc JOIN uw u1 ON bc.w1 = u1.w
        |         JOIN uw u2 ON bc.w2 = u2.w CROSS JOIN tot)
        |SELECT w1, w2, np::BIGINT AS n_pair,
        |       ROUND(pmi0 + 1e-9, 6) + 0.0 AS pmi
        |FROM sc ORDER BY pmi0 DESC, w1, w2 LIMIT 50""".stripMargin,
    "q_text_chunks" ->
      """WITH d AS (SELECT doc_id, text, length(text) AS len
        |           FROM documents WHERE length(text) > 0),
        |s AS (SELECT doc_id, text,
        |        unnest(range(0,
        |          GREATEST(CAST(FLOOR((len - 21)::DOUBLE / 100) AS BIGINT) * 100,
        |                   0) + 1,
        |          100)) AS chunk_start
        |      FROM d)
        |SELECT doc_id AS did, CAST(chunk_start / 100 AS BIGINT) AS chunk_id,
        |       chunk_start,
        |       substring(text, CAST(chunk_start + 1 AS INT), 120) AS chunk
        |FROM s""".stripMargin,
    "q_bm25" ->
      s"""WITH t AS (SELECT doc_id, unnest($ToksExpr) AS w FROM documents),
        |qt AS (SELECT w AS term FROM t WHERE len(w) >= 4
        |       GROUP BY w ORDER BY COUNT(*) DESC, w LIMIT 8),
        |tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM t JOIN qt ON t.w = qt.term
        |       GROUP BY doc_id, w),
        |dl AS (SELECT doc_id, COUNT(*) AS dl FROM t GROUP BY doc_id),
        |st AS (SELECT (SELECT COUNT(*) FROM documents) AS n,
        |              (SELECT COUNT(*) FROM t)::DOUBLE
        |                / (SELECT COUNT(*) FROM documents) AS avgdl),
        |dfq AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY w)
        |SELECT tf.w AS term, tf.doc_id AS did,
        |  ROUND(ln(1.0 + (st.n - dfq.df + 0.5) / (dfq.df + 0.5))
        |    * tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl))
        |    + 1e-9, 6) + 0.0 AS score
        |FROM tf JOIN dl USING (doc_id) JOIN dfq USING (w) CROSS JOIN st""".stripMargin,
    "q_dedup_incr" ->
      """WITH c AS (SELECT text FROM documents WHERE doc_id % 2 = 0),
        |b AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1),
        |f AS (SELECT * FROM b WHERE text NOT IN (SELECT text FROM c)),
        |r AS (SELECT doc_id, text,
        |        ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        |      FROM f)
        |SELECT doc_id, md5(text) AS digest FROM r WHERE rn = 1""".stripMargin,
    "q_span_dedup" ->
      s"""WITH d AS (SELECT doc_id, $ToksExpr AS tk FROM documents),
        |nd AS (SELECT doc_id, tk, len(tk) AS len FROM d WHERE len(tk) > 0),
        |o AS (SELECT doc_id, len, tk,
        |        unnest(range(0, greatest(len - 8, 0) + 1)) AS pos
        |      FROM nd),
        |og AS (SELECT doc_id, len, pos,
        |         md5(list_aggregate(tk[pos+1:pos+8], 'string_agg', ' ')) AS g
        |       FROM o),
        |r AS (SELECT doc_id, len, pos,
        |        ROW_NUMBER() OVER (PARTITION BY g ORDER BY doc_id, pos) AS rn
        |      FROM og),
        |rp AS (SELECT DISTINCT doc_id, p FROM (
        |         SELECT doc_id, unnest(range(pos, least(pos + 8, len))) AS p
        |         FROM r WHERE rn >= 2)),
        |tp AS (SELECT doc_id, unnest(tk) AS tok,
        |         unnest(range(0, len(tk))) AS p FROM nd),
        |k AS (SELECT tp.doc_id, tp.p, tp.tok
        |      FROM tp LEFT JOIN rp ON tp.doc_id = rp.doc_id AND tp.p = rp.p
        |      WHERE rp.doc_id IS NULL),
        |re AS (SELECT doc_id, COUNT(*) AS n_kept,
        |         string_agg(tok, ' ' ORDER BY p) AS txt
        |       FROM k GROUP BY doc_id)
        |SELECT d0.doc_id AS did, md5(coalesce(re.txt, '')) AS digest,
        |  coalesce(nd.len, 0) AS n_tokens,
        |  coalesce(nd.len, 0) - coalesce(re.n_kept, 0) AS n_removed
        |FROM documents d0
        |LEFT JOIN nd ON d0.doc_id = nd.doc_id
        |LEFT JOIN re ON d0.doc_id = re.doc_id""".stripMargin,
    "q_tfidf" ->
      s"""WITH t AS (SELECT doc_id, unnest($ToksExpr) AS w FROM documents),
        |tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM t GROUP BY 1, 2),
        |d AS (SELECT *, COUNT(*) OVER (PARTITION BY w) AS df FROM tf),
        |n AS (SELECT COUNT(*) AS n FROM documents),
        |s AS (SELECT doc_id, w, tf, df,
        |        tf * (ln((1 + n.n)::DOUBLE / (1 + df)::DOUBLE) + 1.0) AS tfidf
        |      FROM d CROSS JOIN n WHERE df >= 5),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
        |        ORDER BY tf DESC, w) AS rn FROM s)
        |SELECT doc_id AS did, w AS term, tf, df,
        |       ROUND(tfidf + 1e-9, 6) + 0.0 AS tfidf
        |FROM r WHERE rn <= 3""".stripMargin,
    // funnel replay: the same first-fail CASE chain, per-stage counts,
    // and the cumulative entering subtraction over the stage table
    "q_funnel" ->
      s"""WITH ff AS (SELECT CASE
        |    WHEN NOT coalesce(lang = 'en', FALSE) THEN 0
        |    WHEN NOT coalesce(len($ToksExpr) >= 30, FALSE) THEN 1
        |    WHEN NOT coalesce(len(text) >= 150, FALSE) THEN 2
        |    WHEN NOT coalesce(source <> 'src0', FALSE) THEN 3
        |    ELSE 4 END AS f
        |  FROM documents),
        |c AS (SELECT f, count(*) AS n FROM ff GROUP BY f),
        |s AS (SELECT * FROM (VALUES (0, 'lang_en'), (1, 'min_tokens'),
        |    (2, 'min_chars'), (3, 'src_ok')) t(stage_idx, stage)),
        |tot AS (SELECT coalesce(sum(n), 0)::BIGINT AS t FROM c),
        |j AS (SELECT s.stage_idx, s.stage, coalesce(c.n, 0) AS failed
        |  FROM s LEFT JOIN c ON c.f = s.stage_idx),
        |e AS (SELECT stage_idx, stage, failed,
        |    ((SELECT t FROM tot) - coalesce(sum(failed) OVER (
        |      ORDER BY stage_idx
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))::BIGINT
        |      AS entering
        |  FROM j)
        |SELECT stage_idx, stage, entering, failed,
        |  entering - failed AS surviving
        |FROM e""".stripMargin,
    // the pipeline funnel re-aggregates the SAME stage CTEs the
    // q_pipeline5 oracle replays: entering(i) = |stage i-1 survivors|,
    // surviving(i) = |stage i survivors|
    "q_funnel_pipeline" ->
      s"""WITH RECURSIVE
        |$Pipeline5StageCtes,
        |n AS (SELECT
        |    (SELECT count(*) FROM d0) AS n0,
        |    (SELECT count(*) FROM q1) AS n1,
        |    (SELECT count(*) FROM q2) AS n2,
        |    (SELECT count(*) FROM q3) AS n3,
        |    (SELECT count(*) FROM q4) AS n4,
        |    (SELECT count(*) FROM q5) AS n5,
        |    (SELECT count(*) FROM q6) AS n6)
        |SELECT t.stage_idx, t.stage, t.entering,
        |  t.entering - t.surviving AS failed, t.surviving
        |FROM (
        |  SELECT 0 AS stage_idx, 'quality' AS stage,
        |         n0 AS entering, n1 AS surviving FROM n
        |  UNION ALL SELECT 1, 'url_blocklist', n1, n2 FROM n
        |  UNION ALL SELECT 2, 'exact_dedup', n2, n3 FROM n
        |  UNION ALL SELECT 3, 'neardup_cluster', n3, n4 FROM n
        |  UNION ALL SELECT 4, 'semdedup', n4, n5 FROM n
        |  UNION ALL SELECT 5, 'decontamination', n5, n6 FROM n) t"""
        .stripMargin,
    // the streaming funnel replay on REAL event time: window start =
    // floor(epoch(ts) / 86400) * 86400 (1-day tumbling windows over the
    // events table's timestamps), the event-shaped first-fail CASE,
    // counts per (window, stage)
    "q_funnel_stream" ->
      """WITH ff AS (SELECT
        |    (CAST(floor(epoch(ts)) AS BIGINT) // 86400) * 86400 AS win_start,
        |    CASE
        |    WHEN NOT coalesce(event_type <> 'error', FALSE) THEN 0
        |    WHEN NOT coalesce(event_type IN ('click', 'purchase', 'signup'),
        |                      FALSE) THEN 1
        |    WHEN NOT coalesce("value" >= 10.0, FALSE) THEN 2
        |    ELSE 3 END AS stage_idx
        |  FROM events)
        |SELECT win_start, stage_idx,
        |  (CASE stage_idx WHEN 0 THEN 'not_error' WHEN 1 THEN 'engaged'
        |    WHEN 2 THEN 'valued' ELSE 'kept' END) AS stage,
        |  count(*) AS n_rows
        |FROM ff GROUP BY 1, 2""".stripMargin,
    "q_quality_gate" ->
      s"""WITH d AS (SELECT doc_id, text, $ToksExpr AS tk FROM documents),
        |s AS (
        |  SELECT doc_id, len(tk) AS n_tokens,
        |    CASE WHEN len(tk) = 0 THEN 0.0
        |         ELSE list_aggregate(list_transform(tk, x -> len(x)), 'sum')::DOUBLE
        |              / len(tk) END AS mean_token_len,
        |    (len(text) - len(replace(text, '#', ''))
        |      + len(regexp_extract_all(text, '\\.{3}|…')))::DOUBLE
        |      / GREATEST(len(tk), 1) AS symbol_ratio,
        |    len(list_filter(tk, x -> regexp_matches(x, '[a-z]')))::DOUBLE
        |      / GREATEST(len(tk), 1) AS alpha_frac,
        |    len(list_filter(['the','a','an','and','or','of','to','in','is','are',
        |                     'was','for','on','with','as','by','at','it','that',
        |                     'this'], w -> list_contains(tk, w))) AS n_stopwords
        |  FROM d)
        |SELECT doc_id, n_tokens, mean_token_len, symbol_ratio, alpha_frac,
        |  n_stopwords,
        |  CASE WHEN n_tokens >= 30 AND n_tokens <= 90 THEN 1 ELSE 0 END
        |    AS r_n_tokens,
        |  CASE WHEN mean_token_len >= 3.0 AND mean_token_len <= 4.3 THEN 1
        |       ELSE 0 END AS r_mean_token_len,
        |  CASE WHEN symbol_ratio <= 0.1 THEN 1 ELSE 0 END AS r_symbol_ratio,
        |  CASE WHEN alpha_frac >= 0.8 THEN 1 ELSE 0 END AS r_alpha_frac,
        |  CASE WHEN n_stopwords >= 2 THEN 1 ELSE 0 END AS r_n_stopwords,
        |  r_n_tokens * r_mean_token_len * r_symbol_ratio * r_alpha_frac
        |    * r_n_stopwords AS passes,
        |  CASE WHEN r_n_tokens = 0 THEN 'n_tokens'
        |       WHEN r_mean_token_len = 0 THEN 'mean_token_len'
        |       WHEN r_symbol_ratio = 0 THEN 'symbol_ratio'
        |       WHEN r_alpha_frac = 0 THEN 'alpha_frac'
        |       WHEN r_n_stopwords = 0 THEN 'n_stopwords'
        |       ELSE NULL END AS reason
        |FROM s""".stripMargin,
    "q_text_stats" ->
      s"""WITH d AS (SELECT doc_id, text, $ToksExpr AS tk FROM documents)
        |SELECT doc_id, len(tk) AS n_tokens,
        |  CASE WHEN len(text) = 0 THEN 0.0
        |       ELSE len(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g'))::DOUBLE / len(text)
        |  END AS punct_ratio,
        |  CASE WHEN len(tk) = 0 THEN 0.0
        |       ELSE len(list_filter(tk, x -> list_contains(
        |         ['the','a','an','and','or','of','to','in','is','are','was',
        |          'for','on','with','as','by','at','it','that','this'], x)))::DOUBLE / len(tk)
        |  END AS stopword_ratio,
        |  CASE WHEN len(tk) = 0 THEN 0.0
        |       ELSE list_aggregate(list_transform(tk, x -> len(x)), 'sum')::DOUBLE / len(tk)
        |  END AS mean_token_len
        |FROM d""".stripMargin,
    "q_text_repetition" ->
      s"""WITH d AS (SELECT doc_id, length(text) AS doclen, $ToksExpr AS toks
        |           FROM documents),
        |t AS (SELECT doc_id, unnest(toks) AS tok FROM d),
        |tc AS (SELECT doc_id, tok, COUNT(*) AS cnt FROM t GROUP BY 1, 2),
        |ta AS (SELECT doc_id,
        |         1.0 - COUNT(*)::DOUBLE / SUM(cnt) AS dup_token_frac,
        |         SUM(CASE WHEN cnt > 1 THEN cnt * length(tok) ELSE 0 END)::DOUBLE
        |           / SUM(cnt * length(tok)) AS dup_token_char_frac
        |       FROM tc GROUP BY 1),
        |g AS (SELECT doc_id, doclen,
        |        unnest([toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))]) AS gram
        |      FROM d WHERE len(toks) >= 2),
        |gc AS (SELECT doc_id, doclen, gram, COUNT(*) AS cnt FROM g GROUP BY 1, 2, 3),
        |tg AS (SELECT doc_id, gram,
        |         (cnt * length(gram))::DOUBLE / doclen AS frac,
        |         ROW_NUMBER() OVER (PARTITION BY doc_id
        |           ORDER BY cnt DESC, gram ASC) AS rn
        |       FROM gc),
        |gd AS (SELECT doc_id,
        |         SUM(CASE WHEN cnt > 1 THEN cnt * length(gram) ELSE 0 END)::DOUBLE
        |           / SUM(cnt * length(gram)) AS dup_ngram_char_frac
        |       FROM gc GROUP BY 1)
        |SELECT d.doc_id,
        |       COALESCE(ta.dup_token_frac, 0.0) AS dup_token_frac,
        |       COALESCE(ta.dup_token_char_frac, 0.0) AS dup_token_char_frac,
        |       COALESCE(tg.gram, '') AS top_ngram,
        |       COALESCE(tg.frac, 0.0) AS top_ngram_char_frac,
        |       COALESCE(gd.dup_ngram_char_frac, 0.0) AS dup_ngram_char_frac
        |FROM d
        |LEFT JOIN ta ON ta.doc_id = d.doc_id
        |LEFT JOIN tg ON tg.doc_id = d.doc_id AND tg.rn = 1
        |LEFT JOIN gd ON gd.doc_id = d.doc_id""".stripMargin,
    "q_contamination" ->
      s"""WITH d AS (SELECT doc_id, $ToksExpr AS toks FROM documents),
        |g0 AS (SELECT doc_id,
        |         CASE WHEN len(toks) = 0 THEN []
        |              WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |              ELSE [array_to_string(toks[i:i+2], ' ')
        |                    for i in range(1, len(toks) - 1)]
        |         END AS grams
        |       FROM d),
        |ge AS (SELECT DISTINCT ('0x' || substring(md5(gram), 1, 15))::BIGINT AS g
        |       FROM (SELECT unnest(grams) AS gram FROM g0 WHERE doc_id % 50 = 0)),
        |gc AS (SELECT DISTINCT doc_id,
        |         ('0x' || substring(md5(gram), 1, 15))::BIGINT AS g
        |       FROM (SELECT doc_id, unnest(grams) AS gram FROM g0
        |             WHERE doc_id % 50 <> 0)),
        |tot AS (SELECT doc_id, COUNT(*) AS n_grams FROM gc GROUP BY 1),
        |hit AS (SELECT gc.doc_id, COUNT(*) AS n_contaminated
        |        FROM gc JOIN ge USING (g) GROUP BY 1)
        |SELECT d.doc_id,
        |       COALESCE(tot.n_grams, 0) AS n_grams,
        |       COALESCE(hit.n_contaminated, 0) AS n_contaminated,
        |       CASE WHEN COALESCE(tot.n_grams, 0) = 0 THEN 0.0
        |            ELSE COALESCE(hit.n_contaminated, 0)::DOUBLE / tot.n_grams
        |       END AS contamination_frac
        |FROM d
        |LEFT JOIN tot ON tot.doc_id = d.doc_id
        |LEFT JOIN hit ON hit.doc_id = d.doc_id
        |WHERE d.doc_id % 50 <> 0""".stripMargin,
    "q_contamination_perrow" ->
      s"""WITH d AS (SELECT doc_id, $ToksExpr AS toks FROM documents),
        |g0 AS (SELECT doc_id,
        |         CASE WHEN len(toks) = 0 THEN []
        |              WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |              ELSE [array_to_string(toks[i:i+2], ' ')
        |                    for i in range(1, len(toks) - 1)]
        |         END AS grams
        |       FROM d),
        |ge AS (SELECT DISTINCT gram
        |       FROM (SELECT unnest(grams) AS gram FROM g0 WHERE doc_id % 50 = 0)),
        |gc AS (SELECT DISTINCT doc_id, gram
        |       FROM (SELECT doc_id, unnest(grams) AS gram FROM g0
        |             WHERE doc_id % 50 <> 0)),
        |tot AS (SELECT doc_id, COUNT(*) AS n_grams FROM gc GROUP BY 1),
        |hit AS (SELECT gc.doc_id, COUNT(*) AS n_contaminated
        |        FROM gc JOIN ge USING (gram) GROUP BY 1)
        |SELECT d.doc_id,
        |       COALESCE(tot.n_grams, 0) AS n_grams,
        |       COALESCE(hit.n_contaminated, 0) AS n_contaminated,
        |       CASE WHEN COALESCE(tot.n_grams, 0) = 0 THEN 0.0
        |            ELSE COALESCE(hit.n_contaminated, 0)::DOUBLE / tot.n_grams
        |       END AS contamination_frac
        |FROM d
        |LEFT JOIN tot ON tot.doc_id = d.doc_id
        |LEFT JOIN hit ON hit.doc_id = d.doc_id
        |WHERE d.doc_id % 50 <> 0""".stripMargin,
    "q_sessionize" ->
      """WITH m AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |              < INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS brk
        |  FROM events),
        |g AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
        |        ROWS UNBOUNDED PRECEDING) AS sid FROM m)
        |SELECT user_id, MIN(ts) AS session_start,
        |       MAX(ts) + INTERVAL 30 MINUTE AS session_stop,
        |       COUNT(*) AS n_events,
        |       round(SUM(value), 6) + 0.0 AS v_sum
        |FROM g GROUP BY user_id, sid""".stripMargin,
    "q_packing" ->
      s"""WITH d AS (SELECT doc_id, len($ToksExpr) AS n FROM documents),
        |nz AS (SELECT doc_id, n FROM d WHERE n > 0),
        |c AS (SELECT doc_id, n,
        |        CAST(SUM(n) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
        |             AS BIGINT) AS e
        |      FROM nz),
        |s AS (SELECT doc_id, e - n AS st, e FROM c),
        |p AS (SELECT doc_id, st, e,
        |        unnest(range(st // 128, (e - 1) // 128 + 1)) AS pack_id
        |      FROM s)
        |SELECT doc_id, pack_id,
        |  greatest(st, pack_id * 128) - st AS off_start,
        |  least(e, (pack_id + 1) * 128) - st AS off_end,
        |  greatest(st, pack_id * 128) - pack_id * 128 AS pack_off
        |FROM p""".stripMargin,
    "q_text_scrub" ->
      """WITH d AS (SELECT doc_id,
        |    text
        |    || CASE WHEN doc_id % 7 = 0 THEN ' ping user7@example.com' ELSE '' END
        |    || CASE WHEN doc_id % 11 = 0 THEN ' at https://data.example.org/x?y=1' ELSE '' END
        |    || CASE WHEN doc_id % 13 = 0 THEN ' from 192.168.0.7' ELSE '' END AS t
        |  FROM documents)
        |SELECT doc_id,
        |  len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
        |  len(regexp_extract_all(t, 'https?://[^\s]+')) AS n_url,
        |  len(regexp_extract_all(t, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS n_ipv4,
        |  regexp_replace(regexp_replace(regexp_replace(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    'https?://[^\s]+', '<URL>', 'g'),
        |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IPV4>', 'g') AS scrubbed
        |FROM d""".stripMargin,
    "q_url_normalize" ->
      """WITH syn AS (SELECT doc_id,
        |    (CASE doc_id % 3 WHEN 0 THEN 'HTTP://' WHEN 1 THEN 'https://' ELSE 'http://' END)
        |    || (CASE doc_id % 4 WHEN 0 THEN 'WWW.News' WHEN 1 THEN 'blog.Site' WHEN 2 THEN 'cdn.media' ELSE 'Docs.Portal' END)
        |    || (CASE doc_id % 5 WHEN 0 THEN '.com' WHEN 1 THEN '.co.uk' WHEN 2 THEN '.org' WHEN 3 THEN '.com.au' ELSE '.io' END)
        |    || (CASE doc_id % 7 WHEN 0 THEN ':80' WHEN 1 THEN ':443' WHEN 2 THEN ':8080' ELSE '' END)
        |    || (CASE WHEN doc_id % 11 = 0 THEN '/' ELSE '/p/' || doc_id::VARCHAR END)
        |    || (CASE WHEN doc_id % 2 = 0 THEN '?utm_source=x&id=' || doc_id::VARCHAR || '&utm_medium=y'
        |             WHEN doc_id % 13 = 0 THEN '?utm_campaign=z' ELSE '' END)
        |    || (CASE WHEN doc_id % 6 = 0 THEN '#sec2' ELSE '' END) AS url
        |  FROM documents),
        |s1 AS (SELECT doc_id, url, regexp_replace(trim(url), '#.*', '', 'g') AS u FROM syn),
        |s2 AS (SELECT doc_id, url, u, regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?]*)', 1) AS pfx FROM s1),
        |s3 AS (SELECT doc_id, url, CASE WHEN pfx = '' THEN u
        |         ELSE lower(pfx) || substring(u, length(pfx) + 1) END AS u FROM s2),
        |s4 AS (SELECT doc_id, url, regexp_replace(regexp_replace(u,
        |         '^(http://[^/:?]+):80([/?]|$)', '\1\2'),
        |         '^(https://[^/:?]+):443([/?]|$)', '\1\2') AS u FROM s3),
        |s5 AS (SELECT doc_id, url, regexp_replace(u,
        |         '([?&])(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|mc_eid)=[^&#]*', '\1', 'g') AS u FROM s4),
        |s6 AS (SELECT doc_id, url, regexp_replace(u, '([?&])&+', '\1', 'g') AS u FROM s5),
        |s7 AS (SELECT doc_id, url, regexp_replace(u, '[?&]+$', '') AS u FROM s6),
        |s8 AS (SELECT doc_id, url, regexp_replace(u, '^(https?://[^/?]+)/$', '\1') AS url_norm FROM s7),
        |h AS (SELECT doc_id, url_norm,
        |        lower(regexp_extract(trim(url), '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/:?#]+)', 1)) AS host
        |      FROM s8)
        |SELECT doc_id, url_norm, host,
        |  CASE WHEN regexp_matches(host, '\.(co|com|net|org|ac|gov|edu)\.[a-z][a-z]$')
        |            AND regexp_extract(host, '([^.]+\.[^.]+\.[^.]+)$', 1) <> ''
        |       THEN regexp_extract(host, '([^.]+\.[^.]+\.[^.]+)$', 1)
        |       WHEN regexp_extract(host, '([^.]+\.[^.]+)$', 1) <> ''
        |       THEN regexp_extract(host, '([^.]+\.[^.]+)$', 1)
        |       ELSE host END AS domain
        |FROM h""".stripMargin,
    "q_html_extract" ->
      """WITH syn AS (SELECT doc_id,
        |    '<!DOCTYPE html><html><head>'
        |    || CASE WHEN doc_id % 3 <> 0 THEN '<title> Doc ' || doc_id::VARCHAR || ' &amp; more </title>' ELSE '' END
        |    || CASE WHEN doc_id % 4 = 0 THEN '<style> body { color: red; } </style>' ELSE '' END
        |    || '</head><body>'
        |    || CASE WHEN doc_id % 5 = 0 THEN '<script type="text/javascript">var x = 1 < 2 && y > 3;</script>' ELSE '' END
        |    || '<!-- nav' || chr(10) || 'boilerplate --><div class="main"><p>'
        |    || substring(text, 1, 120)
        |    || '</p><br>'
        |    || CASE WHEN doc_id % 2 = 0 THEN '<a href="/x">Link</a> &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;end' ELSE '' END
        |    || CASE WHEN doc_id % 7 = 0 THEN '<a href="/y">More</a><A HREF="/z">CAPS</A>' ELSE '' END
        |    || '</div></body></html>' AS html
        |  FROM documents),
        |st AS (SELECT doc_id, html,
        |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(html,
        |      '(?is)<script\b[^>]*>.*?</script>', ' ', 'g'),
        |      '(?is)<style\b[^>]*>.*?</style>', ' ', 'g'),
        |      '(?s)<!--.*?-->', ' ', 'g'),
        |      '<[^>]*>', ' ', 'g') AS raw
        |  FROM syn),
        |dec AS (SELECT doc_id, html,
        |    replace(replace(replace(replace(replace(replace(raw,
        |      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
        |      '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&') AS d
        |  FROM st)
        |SELECT doc_id,
        |  trim(regexp_replace(regexp_extract(html,
        |    '(?is)<title\b[^>]*>(.*?)</title>', 1), '\s+', ' ', 'g')) AS title,
        |  trim(regexp_replace(d, '\s+', ' ', 'g')) AS body_text,
        |  len(regexp_extract_all(html, '(?i)<a[\s>]'))::BIGINT AS n_links,
        |  CASE WHEN length(html) = 0 THEN 0.0
        |       ELSE length(trim(regexp_replace(d, '\s+', ' ', 'g')))::DOUBLE
        |            / length(html)::DOUBLE END AS text_ratio
        |FROM dec""".stripMargin,
    "q_wordpiece" -> {
      // the vocab VALUES come from the same WpVocab Seq the query uses;
      // the recursive CTE replays the greedy longest-match walk: one
      // step per emitted piece, LATERAL picks the longest matching body
      val vals = WpVocab.map { p =>
        val cont = p.startsWith("##")
        val body = if (cont) p.substring(2) else p
        s"('$p','$body',$cont)"
      }.mkString(",")
      s"""WITH RECURSIVE
         |v(piece, body, cont) AS (VALUES $vals),
         |w AS (SELECT doc_id, pos, word FROM (
         |    SELECT doc_id, unnest(string_split_regex(text, '[ \t\n\r]+')) AS word,
         |           generate_subscripts(string_split_regex(text, '[ \t\n\r]+'), 1) AS pos
         |    FROM documents) WHERE word <> ''),
         |step(doc_id, pos, word, at, toks, failed) AS (
         |  SELECT doc_id, pos, word, 0, []::VARCHAR[], false FROM w
         |  UNION ALL
         |  SELECT s.doc_id, s.pos, s.word,
         |    CASE WHEN m.mlen IS NULL THEN length(s.word) ELSE s.at + m.mlen END,
         |    CASE WHEN m.mlen IS NULL THEN ['[UNK]'] ELSE list_append(s.toks, m.mpiece) END,
         |    m.mlen IS NULL
         |  FROM step s LEFT JOIN LATERAL (
         |    SELECT length(body) AS mlen, piece AS mpiece FROM v
         |    WHERE v.cont = (s.at > 0)
         |      AND substr(s.word, s.at + 1, length(body)) = body
         |    ORDER BY length(body) DESC LIMIT 1) m ON true
         |  WHERE s.at < length(s.word) AND NOT s.failed),
         |tok AS (SELECT doc_id, pos, toks FROM step WHERE at >= length(word)),
         |agg AS (SELECT doc_id, flatten(list(toks ORDER BY pos)) AS ft
         |        FROM tok GROUP BY 1)
         |SELECT d.doc_id,
         |  array_to_string(coalesce(a.ft, []::VARCHAR[]), ' ') AS tokens_str,
         |  coalesce(len(a.ft), 0)::BIGINT AS n_tokens,
         |  coalesce(len(list_filter(a.ft, x -> x = '[UNK]')), 0)::BIGINT AS n_unk
         |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id""".stripMargin
    },
    "q_pagerank" -> {
      // 5 unrolled PageRank iterations in integer fixed-point: every
      // contribution is `85·rank // (100·outdeg)` and every combine an
      // integer sum, so the oracle matches the Spark result bit-exactly
      // with no float tolerance (see graft.graph.PageRank's scaladoc).
      val iters = (1 to 5).map { k =>
        val p = s"p${k - 1}"
        s"""c$k AS (SELECT ed.dst, sum(85 * $p.rank // (100 * ed.outdeg))::BIGINT AS contrib
           |  FROM $p JOIN ed ON $p.node = ed.src GROUP BY 1),
           |d$k AS (SELECT coalesce(sum($p.rank), 0)::BIGINT AS dm
           |  FROM $p LEFT JOIN sdeg ON $p.node = sdeg.src WHERE sdeg.src IS NULL),
           |p$k AS (SELECT u.node,
           |    ((SELECT t FROM consts) + 85 * (SELECT dm FROM d$k) // (100 * (SELECT n FROM consts))
           |     + coalesce(c$k.contrib, 0))::BIGINT AS rank
           |  FROM uni u LEFT JOIN c$k ON u.node = c$k.dst)""".stripMargin
      }.mkString(",\n")
      s"""WITH uni AS (SELECT doc_id AS node FROM documents),
         |consts0 AS (SELECT count(*)::BIGINT AS n FROM uni),
         |consts AS (SELECT n, (1000000000000 // n) AS b,
         |    (15 * (1000000000000 // n)) // 100 AS t FROM consts0),
         |e AS (SELECT doc_id AS src, (2*doc_id + 1) % (SELECT n FROM consts) AS dst
         |      FROM documents WHERE doc_id % 7 <> 0
         |      UNION ALL
         |      SELECT doc_id, (3*doc_id + 7) % (SELECT n FROM consts)
         |      FROM documents WHERE doc_id % 3 <> 0),
         |sdeg AS (SELECT src, count(*)::BIGINT AS outdeg FROM e GROUP BY 1),
         |ed AS (SELECT e.src, e.dst, sdeg.outdeg FROM e JOIN sdeg ON e.src = sdeg.src),
         |p0 AS (SELECT node, (SELECT b FROM consts) AS rank FROM uni),
         |$iters
         |SELECT node, rank::BIGINT AS rank_fp FROM p5""".stripMargin
    },
    "q_script_id" ->
      """WITH d AS (SELECT doc_id,
        |    text
        |    || CASE WHEN doc_id % 4 = 1 THEN ' Привет мир' ELSE '' END
        |    || CASE WHEN doc_id % 4 = 2 THEN ' 你好 世界 こんにちは 안녕' ELSE '' END
        |    || CASE WHEN doc_id % 4 = 3 THEN ' مرحبا بالعالم' ELSE '' END
        |    || CASE WHEN doc_id % 5 = 0 THEN ' αβγδ 42' ELSE '' END AS t
        |  FROM documents),
        |c AS (SELECT doc_id,
        |  length(t) - length(regexp_replace(t, '[A-Za-zÀ-ɏ]', '', 'g')) AS n_latin,
        |  length(t) - length(regexp_replace(t, '[Ѐ-ӿ]', '', 'g')) AS n_cyrillic,
        |  length(t) - length(regexp_replace(t, '[Ͱ-Ͽ]', '', 'g')) AS n_greek,
        |  length(t) - length(regexp_replace(t, '[؀-ۿ]', '', 'g')) AS n_arabic,
        |  length(t) - length(regexp_replace(t, '[一-鿿぀-ヿ가-힯]', '', 'g')) AS n_cjk,
        |  length(t) - length(regexp_replace(t, '[0-9]', '', 'g')) AS n_digit
        |FROM d)
        |SELECT doc_id, n_latin, n_cyrillic, n_greek, n_arabic, n_cjk, n_digit,
        |  CASE WHEN GREATEST(n_latin, n_cyrillic, n_greek, n_arabic, n_cjk) = 0 THEN 'none'
        |       WHEN n_latin = GREATEST(n_latin, n_cyrillic, n_greek, n_arabic, n_cjk) THEN 'latin'
        |       WHEN n_cyrillic = GREATEST(n_latin, n_cyrillic, n_greek, n_arabic, n_cjk) THEN 'cyrillic'
        |       WHEN n_greek = GREATEST(n_latin, n_cyrillic, n_greek, n_arabic, n_cjk) THEN 'greek'
        |       WHEN n_arabic = GREATEST(n_latin, n_cyrillic, n_greek, n_arabic, n_cjk) THEN 'arabic'
        |       ELSE 'cjk' END AS main_script
        |FROM c""".stripMargin,
    "q_langid" ->
      s"""WITH d AS (SELECT doc_id, $ToksExpr AS tk FROM documents),
        |s AS (SELECT doc_id,
        |  len(list_filter(tk, x -> list_contains(['der','die','das','und','ist','nicht','mit','ein','zu','ich'], x))) AS de,
        |  len(list_filter(tk, x -> list_contains(['the','and','of','to','is','in','that','it','with','for'], x))) AS en,
        |  len(list_filter(tk, x -> list_contains(['el','la','de','que','y','en','un','es','por','con'], x))) AS es,
        |  len(list_filter(tk, x -> list_contains(['le','la','de','et','est','un','une','que','pour','dans'], x))) AS fr,
        |  len(list_filter(tk, x -> list_contains(['的','是','不','我','了','在','人','有','他','这'], x))) AS zh
        |FROM d)
        |SELECT doc_id,
        |  CASE WHEN GREATEST(de, en, es, fr, zh) = 0 THEN 'und'
        |       WHEN de = GREATEST(de, en, es, fr, zh) THEN 'de'
        |       WHEN en = GREATEST(de, en, es, fr, zh) THEN 'en'
        |       WHEN es = GREATEST(de, en, es, fr, zh) THEN 'es'
        |       WHEN fr = GREATEST(de, en, es, fr, zh) THEN 'fr'
        |       ELSE 'zh' END AS lang_guess
        |FROM s""".stripMargin,
    "q_media_frames" ->
      """SELECT doc_id AS media_id,
        |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |       ELSE 'video' END AS kind,
        |  CASE WHEN doc_id % 3 = 2 THEN CAST(CEIL((n_chars % 30 + 1) / 4.0) AS BIGINT)
        |       ELSE 1 END AS n_sampled
        |FROM documents""".stripMargin,
    "q_bench_contain" ->
      """WITH l AS (SELECT (o_orderkey * 7919 + i) % 10000 AS grp,
        |             ((o_orderkey * 13 + i * 7) % 100000) / 10.0 AS s,
        |             ((o_orderkey * 13 + i * 7) % 100000) / 10.0
        |               + ((o_custkey + i) % 300) / 10.0 AS e
        |           FROM orders CROSS JOIN generate_series(0, 65) AS t(i)),
        |r AS (SELECT (o_orderkey * 104729 + i) % 10000 AS grp,
        |        ((o_orderkey * 31 + i * 17) % 100000) / 10.0 AS p
        |      FROM orders CROSS JOIN generate_series(0, 6) AS t(i))
        |SELECT l.grp, l.s, r.p
        |FROM l JOIN r ON l.grp = r.grp AND r.p >= l.s AND r.p <= l.e""".stripMargin,
    "q_bench_overlap" ->
      """WITH l AS (SELECT (o_orderkey * 7919 + i) % 10000 AS grp,
        |             ((o_orderkey * 13 + i * 7) % 100000) / 10.0 AS s,
        |             ((o_orderkey * 13 + i * 7) % 100000) / 10.0
        |               + ((o_custkey + i) % 300) / 10.0 AS e
        |           FROM orders CROSS JOIN generate_series(0, 65) AS t(i)),
        |r AS (SELECT (o_orderkey * 104729 + i) % 10000 AS grp,
        |        ((o_orderkey * 31 + i * 17) % 100000) / 10.0 AS rs,
        |        ((o_orderkey * 31 + i * 17) % 100000) / 10.0
        |          + ((o_custkey * 3 + i) % 1100) / 10.0 AS re
        |      FROM orders CROSS JOIN generate_series(0, 6) AS t(i))
        |SELECT l.grp, l.s, r.rs
        |FROM l JOIN r ON l.grp = r.grp AND l.s <= r.re AND r.rs <= l.e""".stripMargin,
    // the binned-path probes compute the identical result sets through
    // the binned equi-join — same oracles as the sweep probes
    "q_binned_contain" ->
      """WITH l AS (SELECT (o_orderkey * 7919 + i) % 10000 AS grp,
        |             ((o_orderkey * 13 + i * 7) % 100000) / 10.0 AS s,
        |             ((o_orderkey * 13 + i * 7) % 100000) / 10.0
        |               + ((o_custkey + i) % 300) / 10.0 AS e
        |           FROM orders CROSS JOIN generate_series(0, 65) AS t(i)),
        |r AS (SELECT (o_orderkey * 104729 + i) % 10000 AS grp,
        |        ((o_orderkey * 31 + i * 17) % 100000) / 10.0 AS p
        |      FROM orders CROSS JOIN generate_series(0, 6) AS t(i))
        |SELECT l.grp, l.s, r.p
        |FROM l JOIN r ON l.grp = r.grp AND r.p >= l.s AND r.p <= l.e""".stripMargin,
    "q_binned_overlap" ->
      """WITH l AS (SELECT (o_orderkey * 7919 + i) % 10000 AS grp,
        |             ((o_orderkey * 13 + i * 7) % 100000) / 10.0 AS s,
        |             ((o_orderkey * 13 + i * 7) % 100000) / 10.0
        |               + ((o_custkey + i) % 300) / 10.0 AS e
        |           FROM orders CROSS JOIN generate_series(0, 65) AS t(i)),
        |r AS (SELECT (o_orderkey * 104729 + i) % 10000 AS grp,
        |        ((o_orderkey * 31 + i * 17) % 100000) / 10.0 AS rs,
        |        ((o_orderkey * 31 + i * 17) % 100000) / 10.0
        |          + ((o_custkey * 3 + i) % 1100) / 10.0 AS re
        |      FROM orders CROSS JOIN generate_series(0, 6) AS t(i))
        |SELECT l.grp, l.s, r.rs
        |FROM l JOIN r ON l.grp = r.grp AND l.s <= r.re AND r.rs <= l.e""".stripMargin,
    "q_rule_binned" ->
      """WITH l AS (SELECT (o_orderkey * 13) % 100000 AS s,
        |             (o_orderkey * 13) % 100000 + (o_custkey % 300) AS e
        |           FROM orders WHERE o_orderkey % 20 = 0),
        |r AS (SELECT (o_orderkey * 31) % 100000 AS rs,
        |        (o_orderkey * 31) % 100000 + (o_custkey % 500) AS re
        |      FROM orders WHERE o_orderkey % 97 = 0)
        |SELECT l.s, l.e, r.rs, r.re
        |FROM l JOIN r ON l.s <= r.re AND r.rs <= l.e""".stripMargin,
    "q_rule_sweep" ->
      """WITH l AS (SELECT o_custkey % 40 AS g,
        |             (o_orderkey * 13) % 100000 AS s,
        |             (o_orderkey * 13) % 100000 + (o_custkey % 300) AS e
        |           FROM orders WHERE o_orderkey % 20 = 0),
        |r AS (SELECT o_custkey % 40 AS g2,
        |        (o_orderkey * 31) % 100000 AS rs,
        |        (o_orderkey * 31) % 100000 + (o_custkey % 500) AS re
        |      FROM orders WHERE o_orderkey % 7 = 0)
        |SELECT l.g, l.s, r.rs
        |FROM l JOIN r ON l.g = r.g2 AND l.s <= r.re AND r.rs <= l.e""".stripMargin,
    // the decode is real (PNG via ImageIO, s16le PCM, framed PNG video);
    // the oracle recomputes feature 0 from the pixel/sample FORMULAS the
    // payloads were encoded from (Media.scala pxR/pxG/pxB/pcmSample):
    //   image: mean luminance of y-band 0 (y<2, 32 wide, dim=16)
    //   audio: mean normalized sample of band 0 (i*16 < n)
    //   video: whole-frame mean luminance of decoded frame 0 (8x8)
    // accumulation is double, truncated to REAL before rounding on both
    // engines so summation order cannot flip the 6th decimal
    "q_media_features" ->
      """WITH img AS (
        |  SELECT d.doc_id,
        |    AVG(((CAST((d.doc_id*31 + x.x*7  + y.y*13) % 256 AS DOUBLE)
        |        + CAST((d.doc_id*17 + x.x*11 + y.y*5 ) % 256 AS DOUBLE)
        |        + CAST((d.doc_id*23 + x.x*3  + y.y*19) % 256 AS DOUBLE)) / 3.0) / 255.0) AS f0
        |  FROM documents d, generate_series(0,31) AS x(x), generate_series(0,1) AS y(y)
        |  WHERE d.doc_id % 3 = 0 GROUP BY d.doc_id),
        |vid AS (
        |  SELECT d.doc_id,
        |    AVG(((CAST((d.doc_id*31 + x.x*7  + y.y*13) % 256 AS DOUBLE)
        |        + CAST((d.doc_id*17 + x.x*11 + y.y*5 ) % 256 AS DOUBLE)
        |        + CAST((d.doc_id*23 + x.x*3  + y.y*19) % 256 AS DOUBLE)) / 3.0) / 255.0) AS f0
        |  FROM documents d, generate_series(0,7) AS x(x), generate_series(0,7) AS y(y)
        |  WHERE d.doc_id % 3 = 2 GROUP BY d.doc_id),
        |aud AS (
        |  SELECT d.doc_id,
        |    AVG(((CAST((d.doc_id*7919 + i.i*104729) % 65536 AS DOUBLE) - 32768.0)
        |         / 32768.0 + 1.0) / 2.0) AS f0
        |  FROM documents d, generate_series(0, 16) AS i(i)
        |  WHERE d.doc_id % 3 = 1 AND i.i <= (d.n_chars % 200 + 63) // 16
        |  GROUP BY d.doc_id)
        |SELECT doc_id AS media_id, 'image' AS kind,
        |  CAST(32 AS BIGINT) AS dec_width, CAST(32 AS BIGINT) AS dec_height,
        |  ROUND(CAST(f0 AS REAL) + 1e-9, 6) + 0.0 AS f0 FROM img
        |UNION ALL
        |SELECT doc_id, 'audio', CAST(0 AS BIGINT), CAST(0 AS BIGINT),
        |  ROUND(CAST(f0 AS REAL) + 1e-9, 6) + 0.0 FROM aud
        |UNION ALL
        |SELECT doc_id, 'video', CAST(8 AS BIGINT), CAST(8 AS BIGINT),
        |  ROUND(CAST(f0 AS REAL) + 1e-9, 6) + 0.0 FROM vid""".stripMargin,
    // the decoded-pixel formula (q_media_features' image leg) + the
    // row-0 jitter clamp -> integer luminance cells -> 64-bit aHash
    // (bit 63 via the Long.MinValue literal: DuckDB range-checks
    // 1 << 63) -> all-pairs Hamming <= 2 (the pigeonhole blocking is
    // recall-exact, so LSH == brute force here)
    "q_media_dedup" ->
      """WITH img AS (SELECT doc_id AS id, doc_id - (doc_id % 15) AS base,
        |               (doc_id % 15) // 3 AS delta
        |             FROM documents WHERE doc_id % 3 = 0),
        |px AS (SELECT i.id, (y.y // 4) * 8 + (x.x // 4) AS j,
        |         SUM(LEAST(255, (i.base*31 + x.x*7  + y.y*13) % 256
        |               + CASE WHEN y.y = 0 THEN i.delta ELSE 0 END)
        |           + LEAST(255, (i.base*17 + x.x*11 + y.y*5 ) % 256
        |               + CASE WHEN y.y = 0 THEN i.delta ELSE 0 END)
        |           + LEAST(255, (i.base*23 + x.x*3  + y.y*19) % 256
        |               + CASE WHEN y.y = 0 THEN i.delta ELSE 0 END))::BIGINT AS lum
        |       FROM img i, generate_series(0,31) AS x(x),
        |            generate_series(0,31) AS y(y)
        |       GROUP BY 1, 2),
        |tot AS (SELECT id, SUM(lum)::BIGINT AS total FROM px GROUP BY 1),
        |fp AS (SELECT p.id,
        |         bit_or(CASE WHEN p.lum * 64 <= t.total THEN 0
        |                WHEN p.j = 63 THEN (-9223372036854775807 - 1)
        |                ELSE 1::BIGINT << p.j::INT END)::BIGINT AS f
        |       FROM px p JOIN tot t USING (id) GROUP BY 1)
        |SELECT a.id AS id_l, b.id AS id_r,
        |  bit_count(xor(a.f, b.f))::INT AS hamming
        |FROM fp a JOIN fp b ON a.id < b.id
        |WHERE bit_count(xor(a.f, b.f)) <= 2""".stripMargin,
    // contrast-jitter pHash: pixel formula → integer gains (clamped) →
    // 8×8 integer luminance cells → per-cell fixed-point MEAN
    // (floor(sum · 2^16 / cnt) — Media.MeanScale; cell-count-normalized
    // so brightness-shift invariance holds for dims that don't divide
    // 8) → exact Long 2-D DCT against the EMBEDDED quantized basis
    // literals (Media.DctTable — computed once driver-side, so no
    // cross-engine cos) → 63 sign bits (DC excluded) → full Hamming-≤5
    // join (pigeonhole blocking is recall-exact)
    "q_media_phash" -> {
      val dctVals = (0 until 8).flatMap(k => (0 until 8).map(u =>
        s"($k, $u, ${graft.multimodal.Media.DctTable(k)(u)})"))
        .mkString(", ")
      s"""WITH img AS (SELECT doc_id AS id, doc_id - (doc_id % 15) AS base,
        |               (doc_id % 15) // 3 AS gi
        |             FROM documents WHERE doc_id % 3 = 0),
        |gains(gi, gn, gd) AS (VALUES (0,1,1),(1,9,8),(2,5,4),(3,4,5),(4,7,8)),
        |dct(k, u, t) AS (VALUES $dctVals),
        |px AS (SELECT i.id, y.y // 4 AS r, x.x // 4 AS c,
        |         (SUM(LEAST(255, ((i.base*31 + x.x*7  + y.y*13) % 256) * g.gn // g.gd)
        |           + LEAST(255, ((i.base*17 + x.x*11 + y.y*5 ) % 256) * g.gn // g.gd)
        |           + LEAST(255, ((i.base*23 + x.x*3  + y.y*19) % 256) * g.gn // g.gd))::BIGINT
        |          * ${graft.multimodal.Media.MeanScale}) // COUNT(*) AS lum
        |       FROM img i JOIN gains g USING (gi),
        |            generate_series(0,31) AS x(x), generate_series(0,31) AS y(y)
        |       GROUP BY 1, 2, 3),
        |coef AS (SELECT p.id, tu.u AS u, tv.u AS v,
        |           SUM(p.lum * tu.t * tv.t)::BIGINT AS cv
        |         FROM px p JOIN dct tu ON tu.k = p.r JOIN dct tv ON tv.k = p.c
        |         GROUP BY 1, 2, 3),
        |fp AS (SELECT id, bit_or(CASE WHEN cv > 0
        |         THEN 1::BIGINT << (u*8 + v - 1)::INT ELSE 0 END)::BIGINT AS f
        |       FROM coef WHERE NOT (u = 0 AND v = 0) GROUP BY 1)
        |SELECT a.id AS id_l, b.id AS id_r,
        |  bit_count(xor(a.f, b.f))::INT AS hamming
        |FROM fp a JOIN fp b ON a.id < b.id
        |WHERE bit_count(xor(a.f, b.f)) <= 5""".stripMargin
    },
    // video near-dup: per-clip jittered pixel formulas (vxR/vxG/vxB —
    // id-dependent spatial gradients) → per-frame 8×8 normalized cell
    // means → exact Long DCT against the embedded basis → 63 sign bits
    // per frame → quadratic MIN-over-frame-pairs Hamming ≤ 5 (the
    // pigeonhole frame blocking is recall-exact, so LSH == brute here)
    "q_media_video_dedup" -> {
      val dctVals = (0 until 8).flatMap(k => (0 until 8).map(u =>
        s"($k, $u, ${graft.multimodal.Media.DctTable(k)(u)})"))
        .mkString(", ")
      s"""WITH vids AS (SELECT doc_id AS id, doc_id - (doc_id % 15) + 2 AS base,
        |        ((doc_id % 15) - 2) // 3 AS delta
        |      FROM documents WHERE doc_id % 3 = 2),
        |dct(k, u, t) AS (VALUES $dctVals),
        |px AS (SELECT v.id, f.f, y.y // 4 AS r, x.x // 4 AS c,
        |         (SUM(
        |            LEAST(255, (v.base*31 + f.f*29 + x.x*(7 + v.base % 5)
        |                        + y.y*(13 + v.base % 7)) % 256
        |              + CASE WHEN y.y < 4 THEN v.delta * 8 ELSE 0 END)
        |          + LEAST(255, (v.base*17 + f.f*41 + x.x*(11 + v.base % 3)
        |                        + y.y*(5 + v.base % 11)) % 256
        |              + CASE WHEN y.y < 4 THEN v.delta * 8 ELSE 0 END)
        |          + LEAST(255, (v.base*23 + f.f*59 + x.x*(3 + v.base % 13)
        |                        + y.y*(19 + v.base % 2)) % 256
        |              + CASE WHEN y.y < 4 THEN v.delta * 8 ELSE 0 END))::BIGINT
        |          * ${graft.multimodal.Media.MeanScale}) // COUNT(*) AS lum
        |       FROM vids v
        |       JOIN generate_series(0, 5) AS f(f)
        |         ON f.f < (v.base // 15) % 3 + 4,
        |       generate_series(0,31) AS x(x), generate_series(0,31) AS y(y)
        |       GROUP BY 1, 2, 3, 4),
        |coef AS (SELECT p.id, p.f, tu.u AS u, tv.u AS v,
        |           SUM(p.lum * tu.t * tv.t)::BIGINT AS cv
        |         FROM px p JOIN dct tu ON tu.k = p.r JOIN dct tv ON tv.k = p.c
        |         GROUP BY 1, 2, 3, 4),
        |fp AS (SELECT id, f, bit_or(CASE WHEN cv > 0
        |         THEN 1::BIGINT << (u*8 + v - 1)::INT ELSE 0 END)::BIGINT AS fp
        |       FROM coef WHERE NOT (u = 0 AND v = 0) GROUP BY 1, 2),
        |mh AS (SELECT a.id AS id_l, b.id AS id_r,
        |         MIN(bit_count(xor(a.fp, b.fp)))::INT AS min_hamming
        |       FROM fp a JOIN fp b ON a.id < b.id
        |       GROUP BY 1, 2)
        |SELECT id_l, id_r, min_hamming FROM mh
        |WHERE min_hamming <= 5""".stripMargin
    },
    // the streaming VIDEO gate in batch: per-frame pHash (same replay
    // CTEs as q_media_video_dedup) -> sorted-fp md5 digest -> first
    // arrival = min(media_id) per digest (event time monotone in id)
    "q_media_video_stream" -> {
      val dctVals = (0 until 8).flatMap(k => (0 until 8).map(u =>
        s"($k, $u, ${graft.multimodal.Media.DctTable(k)(u)})"))
        .mkString(", ")
      s"""WITH vids AS (SELECT doc_id AS id, doc_id - (doc_id % 15) + 2 AS base,
        |        ((doc_id % 15) - 2) // 3 AS delta
        |      FROM documents WHERE doc_id % 3 = 2),
        |dct(k, u, t) AS (VALUES $dctVals),
        |px AS (SELECT v.id, f.f, y.y // 4 AS r, x.x // 4 AS c,
        |         (SUM(
        |            LEAST(255, (v.base*31 + f.f*29 + x.x*(7 + v.base % 5)
        |                        + y.y*(13 + v.base % 7)) % 256
        |              + CASE WHEN y.y < 4 THEN v.delta * 8 ELSE 0 END)
        |          + LEAST(255, (v.base*17 + f.f*41 + x.x*(11 + v.base % 3)
        |                        + y.y*(5 + v.base % 11)) % 256
        |              + CASE WHEN y.y < 4 THEN v.delta * 8 ELSE 0 END)
        |          + LEAST(255, (v.base*23 + f.f*59 + x.x*(3 + v.base % 13)
        |                        + y.y*(19 + v.base % 2)) % 256
        |              + CASE WHEN y.y < 4 THEN v.delta * 8 ELSE 0 END))::BIGINT
        |          * ${graft.multimodal.Media.MeanScale}) // COUNT(*) AS lum
        |       FROM vids v
        |       JOIN generate_series(0, 5) AS f(f)
        |         ON f.f < (v.base // 15) % 3 + 4,
        |       generate_series(0,31) AS x(x), generate_series(0,31) AS y(y)
        |       GROUP BY 1, 2, 3, 4),
        |coef AS (SELECT p.id, p.f, tu.u AS u, tv.u AS v,
        |           SUM(p.lum * tu.t * tv.t)::BIGINT AS cv
        |         FROM px p JOIN dct tu ON tu.k = p.r JOIN dct tv ON tv.k = p.c
        |         GROUP BY 1, 2, 3, 4),
        |fp AS (SELECT id, f, bit_or(CASE WHEN cv > 0
        |         THEN 1::BIGINT << (u*8 + v - 1)::INT ELSE 0 END)::BIGINT AS fp
        |       FROM coef WHERE NOT (u = 0 AND v = 0) GROUP BY 1, 2),
        |dig AS (SELECT id,
        |         md5(string_agg(fp::VARCHAR, ',' ORDER BY fp)) AS vdigest
        |       FROM fp GROUP BY 1)
        |SELECT min(id) AS did, vdigest FROM dig GROUP BY vdigest"""
        .stripMargin
    },
    // the streaming gate in batch: first arrival (min media_id — event
    // time is monotone in it) per aHash, same pixel/fingerprint replay
    // as q_media_dedup
    "q_media_dedup_stream" ->
      """WITH img AS (SELECT doc_id AS id, doc_id - (doc_id % 15) AS base,
        |               (doc_id % 15) // 3 AS delta
        |             FROM documents WHERE doc_id % 3 = 0),
        |px AS (SELECT i.id, (y.y // 4) * 8 + (x.x // 4) AS j,
        |         SUM(LEAST(255, (i.base*31 + x.x*7  + y.y*13) % 256
        |               + CASE WHEN y.y = 0 THEN i.delta ELSE 0 END)
        |           + LEAST(255, (i.base*17 + x.x*11 + y.y*5 ) % 256
        |               + CASE WHEN y.y = 0 THEN i.delta ELSE 0 END)
        |           + LEAST(255, (i.base*23 + x.x*3  + y.y*19) % 256
        |               + CASE WHEN y.y = 0 THEN i.delta ELSE 0 END))::BIGINT AS lum
        |       FROM img i, generate_series(0,31) AS x(x),
        |            generate_series(0,31) AS y(y)
        |       GROUP BY 1, 2),
        |tot AS (SELECT id, SUM(lum)::BIGINT AS total FROM px GROUP BY 1),
        |fp AS (SELECT p.id,
        |         bit_or(CASE WHEN p.lum * 64 <= t.total THEN 0
        |                WHEN p.j = 63 THEN (-9223372036854775807 - 1)
        |                ELSE 1::BIGINT << p.j::INT END)::BIGINT AS f
        |       FROM px p JOIN tot t USING (id) GROUP BY 1)
        |SELECT min(id) AS did, f AS ah FROM fp GROUP BY f""".stripMargin,
    // audio near-dup: gain-replica PCM fixture (two-stage integer
    // envelope hash × pseudo-noise magnitude, exact truncating
    // divisions) → 64 envelope-bin sums → fixed-point means
    // (Media.AudioMeanScale = 2^11, 16 samples/bin exactly) → exact
    // Long DCT against the embedded basis → 63 sign bits → full
    // Hamming-≤5 join (pigeonhole blocking is recall-exact)
    "q_audio_dedup" -> {
      val dctVals = (0 until 8).flatMap(k => (0 until 8).map(u =>
        s"($k, $u, ${graft.multimodal.Media.DctTable(k)(u)})"))
        .mkString(", ")
      s"""WITH aud AS (SELECT doc_id AS id, doc_id - (doc_id % 15) + 1 AS base,
        |               ((doc_id % 15) - 1) // 3 AS gi
        |             FROM documents WHERE doc_id % 3 = 1),
        |gains(gi, gn, gd) AS (VALUES (0,1,1),(1,9,8),(2,5,4),(3,4,5),(4,7,8)),
        |dct(k, u, t) AS (VALUES $dctVals),
        |smp AS (SELECT a.id, i.i // 16 AS j,
        |          SUM((((a.base*7919 + i.i*104729) % 4096)
        |            * (((((a.base*(i.i//16 + 1))*7919 + (i.i//16)*104729) % 4093)
        |                 * 1299709 + a.base*31) % 251 + 2)
        |            // 64) * g.gn // g.gd
        |            + CASE WHEN i.i // 16 < 8 THEN 16 * a.gi ELSE 0 END)::BIGINT AS ssum
        |        FROM aud a JOIN gains g USING (gi),
        |             generate_series(0, 1023) AS i(i)
        |        GROUP BY 1, 2),
        |coef AS (SELECT m.id, tu.u AS u, tv.u AS v,
        |           SUM(((m.ssum * 2048) // 16) * tu.t * tv.t)::BIGINT AS cv
        |         FROM smp m JOIN dct tu ON tu.k = m.j // 8
        |                    JOIN dct tv ON tv.k = m.j % 8
        |         GROUP BY 1, 2, 3),
        |fp AS (SELECT id, bit_or(CASE WHEN cv > 0
        |         THEN 1::BIGINT << (u*8 + v - 1)::INT ELSE 0 END)::BIGINT AS f
        |       FROM coef WHERE NOT (u = 0 AND v = 0) GROUP BY 1)
        |SELECT a.id AS id_l, b.id AS id_r,
        |  bit_count(xor(a.f, b.f))::INT AS hamming
        |FROM fp a JOIN fp b ON a.id < b.id
        |WHERE bit_count(xor(a.f, b.f)) <= 5""".stripMargin
    },
    // the streaming AUDIO gate in batch: envelope fingerprint (same
    // replay CTEs as q_audio_dedup) -> first arrival = min(media_id)
    // per fingerprint (event time monotone in id)
    "q_audio_dedup_stream" -> {
      val dctVals = (0 until 8).flatMap(k => (0 until 8).map(u =>
        s"($k, $u, ${graft.multimodal.Media.DctTable(k)(u)})"))
        .mkString(", ")
      s"""WITH aud AS (SELECT doc_id AS id, doc_id - (doc_id % 15) + 1 AS base,
        |               ((doc_id % 15) - 1) // 3 AS gi
        |             FROM documents WHERE doc_id % 3 = 1),
        |gains(gi, gn, gd) AS (VALUES (0,1,1),(1,9,8),(2,5,4),(3,4,5),(4,7,8)),
        |dct(k, u, t) AS (VALUES $dctVals),
        |smp AS (SELECT a.id, i.i // 16 AS j,
        |          SUM((((a.base*7919 + i.i*104729) % 4096)
        |            * (((((a.base*(i.i//16 + 1))*7919 + (i.i//16)*104729) % 4093)
        |                 * 1299709 + a.base*31) % 251 + 2)
        |            // 64) * g.gn // g.gd
        |            + CASE WHEN i.i // 16 < 8 THEN 16 * a.gi ELSE 0 END)::BIGINT AS ssum
        |        FROM aud a JOIN gains g USING (gi),
        |             generate_series(0, 1023) AS i(i)
        |        GROUP BY 1, 2),
        |coef AS (SELECT m.id, tu.u AS u, tv.u AS v,
        |           SUM(((m.ssum * 2048) // 16) * tu.t * tv.t)::BIGINT AS cv
        |         FROM smp m JOIN dct tu ON tu.k = m.j // 8
        |                    JOIN dct tv ON tv.k = m.j % 8
        |         GROUP BY 1, 2, 3),
        |fp AS (SELECT id, bit_or(CASE WHEN cv > 0
        |         THEN 1::BIGINT << (u*8 + v - 1)::INT ELSE 0 END)::BIGINT AS f
        |       FROM coef WHERE NOT (u = 0 AND v = 0) GROUP BY 1)
        |SELECT min(id) AS did, f AS afp FROM fp GROUP BY f""".stripMargin
    },
    // multimodal curation chain: token-count quality gate -> exact text
    // dedup -> ONE perceptual media gate over all three kinds, with the
    // near-dup pair sets computed WITHIN the text-gate survivors and
    // the pairwise first-wins drop rule (a doc drops iff it is the
    // larger id of some pair). The funnel output pins both the stage
    // arithmetic and the per-kind attribution. Media CTEs are the
    // q_media_dedup / q_audio_dedup / q_media_video_dedup replays with
    // the survivor restriction folded into their seed CTEs.
    "q_pipeline6" -> {
      val dctVals = (0 until 8).flatMap(k => (0 until 8).map(u =>
        s"($k, $u, ${graft.multimodal.Media.DctTable(k)(u)})"))
        .mkString(", ")
      s"""WITH d0 AS (SELECT doc_id, text FROM documents),
        |tks AS (SELECT doc_id, text, $ToksExpr AS tk FROM d0),
        |q1 AS MATERIALIZED (SELECT doc_id, text FROM tks
        |       WHERE len(tk) BETWEEN 12 AND 1000),
        |sv AS (SELECT MIN(doc_id) AS doc_id FROM q1 GROUP BY text),
        |q2 AS MATERIALIZED (SELECT q1.* FROM q1 JOIN sv USING (doc_id)),
        |dct(k, u, t) AS (VALUES $dctVals),
        |gains(gi, gn, gd) AS (VALUES (0,1,1),(1,9,8),(2,5,4),(3,4,5),(4,7,8)),
        |img AS (SELECT doc_id AS id, doc_id - (doc_id % 15) AS base,
        |               (doc_id % 15) // 3 AS delta
        |        FROM q2 WHERE doc_id % 3 = 0),
        |ipx AS (SELECT i.id, (y.y // 4) * 8 + (x.x // 4) AS j,
        |         SUM(LEAST(255, (i.base*31 + x.x*7  + y.y*13) % 256
        |               + CASE WHEN y.y = 0 THEN i.delta ELSE 0 END)
        |           + LEAST(255, (i.base*17 + x.x*11 + y.y*5 ) % 256
        |               + CASE WHEN y.y = 0 THEN i.delta ELSE 0 END)
        |           + LEAST(255, (i.base*23 + x.x*3  + y.y*19) % 256
        |               + CASE WHEN y.y = 0 THEN i.delta ELSE 0 END))::BIGINT AS lum
        |       FROM img i, generate_series(0,31) AS x(x),
        |            generate_series(0,31) AS y(y)
        |       GROUP BY 1, 2),
        |itot AS (SELECT id, SUM(lum)::BIGINT AS total FROM ipx GROUP BY 1),
        |ifp AS (SELECT p.id,
        |         bit_or(CASE WHEN p.lum * 64 <= t.total THEN 0
        |                WHEN p.j = 63 THEN (-9223372036854775807 - 1)
        |                ELSE 1::BIGINT << p.j::INT END)::BIGINT AS f
        |       FROM ipx p JOIN itot t USING (id) GROUP BY 1),
        |ipair AS (SELECT DISTINCT b.id AS id_r FROM ifp a JOIN ifp b
        |       ON a.id < b.id WHERE bit_count(xor(a.f, b.f)) <= 2),
        |aud AS (SELECT doc_id AS id, doc_id - (doc_id % 15) + 1 AS base,
        |               ((doc_id % 15) - 1) // 3 AS gi
        |        FROM q2 WHERE doc_id % 3 = 1),
        |smp AS (SELECT a.id, i.i // 16 AS j,
        |          SUM((((a.base*7919 + i.i*104729) % 4096)
        |            * (((((a.base*(i.i//16 + 1))*7919 + (i.i//16)*104729) % 4093)
        |                 * 1299709 + a.base*31) % 251 + 2)
        |            // 64) * g.gn // g.gd
        |            + CASE WHEN i.i // 16 < 8 THEN 16 * a.gi ELSE 0 END)::BIGINT AS ssum
        |        FROM aud a JOIN gains g USING (gi),
        |             generate_series(0, 1023) AS i(i)
        |        GROUP BY 1, 2),
        |acoef AS (SELECT m.id, tu.u AS u, tv.u AS v,
        |           SUM(((m.ssum * 2048) // 16) * tu.t * tv.t)::BIGINT AS cv
        |         FROM smp m JOIN dct tu ON tu.k = m.j // 8
        |                    JOIN dct tv ON tv.k = m.j % 8
        |         GROUP BY 1, 2, 3),
        |afp AS (SELECT id, bit_or(CASE WHEN cv > 0
        |         THEN 1::BIGINT << (u*8 + v - 1)::INT ELSE 0 END)::BIGINT AS f
        |       FROM acoef WHERE NOT (u = 0 AND v = 0) GROUP BY 1),
        |apair AS (SELECT DISTINCT b.id AS id_r FROM afp a JOIN afp b
        |       ON a.id < b.id WHERE bit_count(xor(a.f, b.f)) <= 5),
        |vids AS (SELECT doc_id AS id, doc_id - (doc_id % 15) + 2 AS base,
        |        ((doc_id % 15) - 2) // 3 AS delta
        |      FROM q2 WHERE doc_id % 3 = 2),
        |vpx AS (SELECT v.id, f.f, y.y // 4 AS r, x.x // 4 AS c,
        |         (SUM(
        |            LEAST(255, (v.base*31 + f.f*29 + x.x*(7 + v.base % 5)
        |                        + y.y*(13 + v.base % 7)) % 256
        |              + CASE WHEN y.y < 4 THEN v.delta * 8 ELSE 0 END)
        |          + LEAST(255, (v.base*17 + f.f*41 + x.x*(11 + v.base % 3)
        |                        + y.y*(5 + v.base % 11)) % 256
        |              + CASE WHEN y.y < 4 THEN v.delta * 8 ELSE 0 END)
        |          + LEAST(255, (v.base*23 + f.f*59 + x.x*(3 + v.base % 13)
        |                        + y.y*(19 + v.base % 2)) % 256
        |              + CASE WHEN y.y < 4 THEN v.delta * 8 ELSE 0 END))::BIGINT
        |          * ${graft.multimodal.Media.MeanScale}) // COUNT(*) AS lum
        |       FROM vids v
        |       JOIN generate_series(0, 5) AS f(f)
        |         ON f.f < (v.base // 15) % 3 + 4,
        |       generate_series(0,31) AS x(x), generate_series(0,31) AS y(y)
        |       GROUP BY 1, 2, 3, 4),
        |vcoef AS (SELECT p.id, p.f, tu.u AS u, tv.u AS v,
        |           SUM(p.lum * tu.t * tv.t)::BIGINT AS cv
        |         FROM vpx p JOIN dct tu ON tu.k = p.r JOIN dct tv ON tv.k = p.c
        |         GROUP BY 1, 2, 3, 4),
        |vfp AS (SELECT id, f, bit_or(CASE WHEN cv > 0
        |         THEN 1::BIGINT << (u*8 + v - 1)::INT ELSE 0 END)::BIGINT AS fp
        |       FROM vcoef WHERE NOT (u = 0 AND v = 0) GROUP BY 1, 2),
        |vpair AS (SELECT DISTINCT b.id AS id_r
        |       FROM vfp a JOIN vfp b ON a.id < b.id
        |       GROUP BY a.id, b.id
        |       HAVING MIN(bit_count(xor(a.fp, b.fp))) <= 5),
        |drops AS (SELECT id_r FROM ipair UNION SELECT id_r FROM apair
        |          UNION SELECT id_r FROM vpair),
        |q3 AS (SELECT q2.* FROM q2
        |       WHERE doc_id NOT IN (SELECT id_r FROM drops))
        |SELECT '0_ingest' AS stage, COUNT(*)::BIGINT AS n FROM d0
        |UNION ALL SELECT '1_quality', COUNT(*)::BIGINT FROM q1
        |UNION ALL SELECT '2_exact_dedup', COUNT(*)::BIGINT FROM q2
        |UNION ALL SELECT '3_media_gate', COUNT(*)::BIGINT FROM q3
        |UNION ALL SELECT '3_drop_image', COUNT(*)::BIGINT FROM ipair
        |UNION ALL SELECT '3_drop_audio', COUNT(*)::BIGINT FROM apair
        |UNION ALL SELECT '3_drop_video', COUNT(*)::BIGINT FROM vpair"""
        .stripMargin
    },
    // winnowing fingerprints over md5-hex gram hashes (k=4 token grams,
    // window w=5, min per window, sorted distinct) — md5 makes the hash
    // engine-portable, and string min/sort orders agree byte-wise
    "q_text_fingerprint" ->
      s"""WITH d AS (SELECT doc_id, $ToksExpr AS tk FROM documents),
        |g AS (SELECT doc_id,
        |        [md5(coalesce(list_aggregate(tk[i:i+3], 'string_agg', ' '), ''))
        |         FOR i IN range(1, greatest(len(tk) - 4, 0) + 2)] AS gr
        |      FROM d),
        |f AS (SELECT doc_id,
        |        list_sort(list_distinct(
        |          [list_min(gr[i:i+4]) FOR i IN range(1, greatest(len(gr) - 5, 0) + 2)])) AS fps
        |      FROM g)
        |SELECT doc_id, CAST(len(fps) AS BIGINT) AS n_fp,
        |       md5(coalesce(list_aggregate(fps, 'string_agg', ','), '')) AS digest
        |FROM f""".stripMargin,
    // simhash over 60-bit md5-prefix token hashes; with maxHamming=3 and
    // 4 pigeonhole blocks the blocking is EXACT (any pair within distance
    // 3 shares >=1 untouched block), so the oracle is the full
    // quadratic hamming join
    // batch-mode streaming gate: keep min(doc_id) per fingerprint (event
    // time is monotone in doc_id, so first-arrival == min id)
    "q_dedup_simhash_stream" ->
      s"""WITH d AS (SELECT doc_id, $ToksExpr AS tk FROM documents),
        |h AS (SELECT doc_id,
        |        [CAST('0x' || substring(md5(t), 1, 15) AS BIGINT) FOR t IN tk] AS hs
        |      FROM d),
        |s AS (SELECT doc_id, CAST(coalesce(list_sum(
        |        [CASE WHEN coalesce(list_sum(
        |                [CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END FOR h IN hs]), 0) > 0
        |              THEN 1::BIGINT << j ELSE 0 END
        |         FOR j IN range(0, 60)]), 0) AS BIGINT) AS sim
        |      FROM h)
        |SELECT MIN(doc_id) AS did, sim FROM s GROUP BY sim""".stripMargin,
    // pigeonhole-block audit: 4 blocks of 16 bits (maxHamming 3), blocks
    // with > 1 member — the refused set at maxBucket = 1
    "q_dedup_audit" ->
      s"""WITH d AS (SELECT doc_id, $ToksExpr AS tk FROM documents),
        |h AS (SELECT doc_id,
        |        [CAST('0x' || substring(md5(t), 1, 15) AS BIGINT) FOR t IN tk] AS hs
        |      FROM d),
        |s AS (SELECT doc_id, CAST(coalesce(list_sum(
        |        [CASE WHEN coalesce(list_sum(
        |                [CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END FOR h IN hs]), 0) > 0
        |              THEN 1::BIGINT << j ELSE 0 END
        |         FOR j IN range(0, 60)]), 0) AS BIGINT) AS sim
        |      FROM h),
        |b AS (SELECT doc_id, CAST(j AS INT) AS blk,
        |        CASE WHEN j = 3 THEN sim >> 48
        |             ELSE (sim >> (16 * j)) & 65535 END AS key
        |      FROM s, range(0, 4) t(j))
        |SELECT blk, key, COUNT(*) AS members FROM b
        |GROUP BY 1, 2 HAVING COUNT(*) > 1""".stripMargin,
    "q_dedup_simhash" ->
      s"""WITH d AS (SELECT doc_id, $ToksExpr AS tk FROM documents),
        |h AS (SELECT doc_id,
        |        [CAST('0x' || substring(md5(t), 1, 15) AS BIGINT) FOR t IN tk] AS hs
        |      FROM d),
        |s AS (SELECT doc_id, CAST(coalesce(list_sum(
        |        [CASE WHEN coalesce(list_sum(
        |                [CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END FOR h IN hs]), 0) > 0
        |              THEN 1::BIGINT << j ELSE 0 END
        |         FOR j IN range(0, 60)]), 0) AS BIGINT) AS sim
        |      FROM h)
        |SELECT a.doc_id AS id_l, b.doc_id AS id_r,
        |       CAST(bit_count(xor(a.sim, b.sim)) AS INT) AS hamming
        |FROM s a JOIN s b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.sim, b.sim)) <= 3""".stripMargin,
    "q_kmeans" ->
      s"""$KMeansCte
         |SELECT vec_id, CAST(cluster AS INT) AS cluster,
         |       CAST(dist AS BIGINT) AS dist
         |FROM fr WHERE rn = 1""".stripMargin,
    "q_pipeline4" ->
      // whole chain: fixed-point Lloyd assignment → per-cluster md5-rank
      // stratified quota — the cluster-balanced subset recipe checked as
      // one unit (same kmeans CTE, then the q_sample_stratified rule)
      s"""$KMeansCte,
         |asg AS (SELECT vec_id, CAST(cluster AS INT) AS cluster
         |        FROM fr WHERE rn = 1),
         |r AS (SELECT vec_id, cluster,
         |    ROW_NUMBER() OVER (PARTITION BY cluster ORDER BY
         |      ('0x' || substring(md5(CONCAT_WS('#', 7, vec_id)), 1, 15))::BIGINT,
         |      vec_id) AS srn
         |  FROM asg)
         |SELECT vec_id, cluster FROM r WHERE srn <= 20""".stripMargin,
    // random-hyperplane LSH with integer-modular plane components (exact
    // in every engine); candidates = pairs sharing a 6-bit signature in
    // any of the 8 tables, kept when exact cosine >= 0.3
    "q_ann_lsh" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        |  WHERE embedding IS NOT NULL),
        |t AS (SELECT unnest(range(0, 8)) AS tbl),
        |sig AS (
        |  SELECT e.vec_id, t.tbl,
        |    CAST(coalesce(list_sum([CASE WHEN
        |        coalesce(list_sum([e.v[d + 1] *
        |          ((((t.tbl + 1) * 7919 + (i + 1) * 104729 + (d + 1) * 1299709)
        |            % 1000003 % 2001) / 1000.0 - 1.0)
        |          FOR d IN range(0, 64)]), 0.0) > 0
        |      THEN 1::BIGINT << i ELSE 0 END FOR i IN range(0, 6)]), 0) AS BIGINT) AS sig
        |  FROM e CROSS JOIN t),
        |p AS (SELECT DISTINCT a.vec_id AS id_l, b.vec_id AS id_r
        |      FROM sig a JOIN sig b
        |        ON a.tbl = b.tbl AND a.sig = b.sig AND a.vec_id < b.vec_id)
        |SELECT p.id_l, p.id_r,
        |  ROUND(list_cosine_similarity(x.embedding::DOUBLE[], y.embedding::DOUBLE[])
        |        + 1e-9, 6) + 0.0 AS cosine
        |FROM p JOIN embeddings x ON x.vec_id = p.id_l
        |       JOIN embeddings y ON y.vec_id = p.id_r
        |WHERE list_cosine_similarity(x.embedding::DOUBLE[], y.embedding::DOUBLE[]) >= 0.3""".stripMargin,
    // multi-probe replay: per-plane dots (ascending-d fold = the Spark
    // native accumulation), base signature from the same dots, bits
    // ranked by (abs(dot), bit), XOR probe set, exclude-self candidate
    // union across tables/probes, exact-cosine re-rank
    "q_ann_lsh_mp" -> LshMpOracle,
    // the persisted (tbl, sig)-partitioned index must be row-invisible:
    // the pruned search shares the in-memory search's oracle verbatim
    "q_ann_lsh_layout" -> LshMpOracle,
    // append + compact must be search-invisible: the lifecycle query
    // replays exactly like the in-session multi-probe search
    "q_ann_lsh_lifecycle" -> LshMpOracle,
    "q_ann_lsh_mp2" -> LshMp2Oracle,
    // the persisted order-2 index must be row-invisible: same replay
    "q_ann_lsh_mp2_layout" -> LshMp2Oracle,
    // line-level dedup: frequency threshold ceil(0.78·n_docs) computed in
    // the same IEEE double arithmetic as the Spark side's math.ceil
    "q_line_dedup" ->
      """WITH l AS (SELECT doc_id, unnest(string_split(text, ' ')) AS line,
        |                  generate_subscripts(string_split(text, ' '), 1) AS pos
        |           FROM documents),
        |f AS (SELECT line FROM l GROUP BY line
        |      HAVING COUNT(DISTINCT doc_id) >=
        |        (SELECT CAST(ceil(0.78 * COUNT(*)) AS BIGINT) FROM documents)),
        |k AS (SELECT * FROM l WHERE line NOT IN (SELECT line FROM f)),
        |r AS (SELECT doc_id, string_agg(line, ' ' ORDER BY pos) AS kept_text,
        |             COUNT(*) AS n_kept FROM k GROUP BY doc_id)
        |SELECT d.doc_id AS did, COALESCE(r.kept_text, '') AS kept_text,
        |       CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_lines,
        |       CAST(len(string_split(d.text, ' ')) AS BIGINT)
        |         - COALESCE(r.n_kept, 0) AS n_removed
        |FROM documents d LEFT JOIN r USING (doc_id)""".stripMargin,
    "q_rolling" ->
      """SELECT event_id AS eid,
        |  COUNT(value) OVER w AS roll_count,
        |  ROUND(SUM(value) OVER w + 1e-9, 6) + 0.0 AS roll_sum,
        |  ROUND(AVG(value) OVER w + 1e-9, 6) + 0.0 AS roll_mean,
        |  MIN(value) OVER w AS roll_min,
        |  MAX(value) OVER w AS roll_max
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""".stripMargin,
    "q_rolling_rows" ->
      """SELECT event_id AS eid,
        |  COUNT(value) OVER w AS roll_count,
        |  CASE WHEN COUNT(value) OVER w >= 3
        |       THEN ROUND(SUM(value) OVER w + 1e-9, 6) + 0.0 END AS roll_sum,
        |  CASE WHEN COUNT(value) OVER w >= 3
        |       THEN ROUND(AVG(value) OVER w + 1e-9, 6) + 0.0 END AS roll_mean
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)""".stripMargin,
    "q_json_extract" ->
      """SELECT event_id AS eid, event_type,
        |       CAST(props->>'k' AS BIGINT) AS k
        |FROM events
        |WHERE CAST(props->>'k' AS BIGINT) >= 50""".stripMargin,
    "q_interval_anti" ->
      """SELECT e.event_id AS eid FROM events e
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM events b
        |  WHERE b.event_type = 'error' AND b.user_id = e.user_id
        |    AND e.ts >= b.ts AND e.ts <= b.ts + INTERVAL 1 HOUR)""".stripMargin,
    "q_interval_subtract" ->
      // half-open [start, stop) subtraction: merge the per-order blackout
      // union via gaps-and-islands (touching pieces merge: rs > prev_max
      // strictly), then carve each order window with the same lag /
      // row_number-tail walk the operator runs distributed
      """WITH l AS (SELECT o_orderkey AS okey, o_orderdate AS ls,
        |             o_orderdate + INTERVAL 30 DAY AS le FROM orders),
        |r0 AS (SELECT l_orderkey AS okey, l_shipdate AS rs,
        |         l_shipdate + INTERVAL 7 DAY AS re FROM lineitem),
        |ev AS (SELECT okey, rs, re,
        |         max(re) OVER (PARTITION BY okey ORDER BY rs, re
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
        |       FROM r0),
        |isl AS (SELECT okey, rs, re,
        |          sum(CASE WHEN prev_max IS NULL OR rs > prev_max THEN 1 ELSE 0 END)
        |            OVER (PARTITION BY okey ORDER BY rs, re) AS grp
        |        FROM ev),
        |ru AS (SELECT okey, min(rs) AS rs, max(re) AS re FROM isl GROUP BY okey, grp),
        |m AS (SELECT l.okey, l.ls, l.le, ru.rs, ru.re
        |      FROM l LEFT JOIN ru ON l.okey = ru.okey
        |        AND ru.rs < l.le AND ru.re > l.ls),
        |w AS (SELECT okey, ls, le, rs, re,
        |        lag(re) OVER (PARTITION BY okey ORDER BY rs) AS prev_re,
        |        row_number() OVER (PARTITION BY okey ORDER BY rs)
        |          = count(*) OVER (PARTITION BY okey) AS is_last
        |      FROM m),
        |seg AS (
        |  SELECT okey, greatest(ls, coalesce(prev_re, ls)) AS s, least(le, rs) AS e
        |  FROM w WHERE rs IS NOT NULL
        |  UNION ALL
        |  SELECT okey, greatest(ls, re) AS s, le AS e
        |  FROM w WHERE rs IS NOT NULL AND is_last
        |  UNION ALL
        |  SELECT okey, ls AS s, le AS e FROM w WHERE rs IS NULL)
        |SELECT okey, s AS start, e AS stop FROM seg WHERE s < e""".stripMargin,
    "q_interval_intersect" ->
      // half-open [start, stop) intersection: merge the per-order
      // coverage union via gaps-and-islands (identical CTE to the
      // subtract oracle), then one inner overlap join + clamp
      """WITH l AS (SELECT o_orderkey AS okey, o_orderdate AS ls,
        |             o_orderdate + INTERVAL 30 DAY AS le FROM orders),
        |r0 AS (SELECT l_orderkey AS okey, l_shipdate AS rs,
        |         l_shipdate + INTERVAL 7 DAY AS re FROM lineitem),
        |ev AS (SELECT okey, rs, re,
        |         max(re) OVER (PARTITION BY okey ORDER BY rs, re
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
        |       FROM r0),
        |isl AS (SELECT okey, rs, re,
        |          sum(CASE WHEN prev_max IS NULL OR rs > prev_max THEN 1 ELSE 0 END)
        |            OVER (PARTITION BY okey ORDER BY rs, re) AS grp
        |        FROM ev),
        |ru AS (SELECT okey, min(rs) AS rs, max(re) AS re FROM isl GROUP BY okey, grp)
        |SELECT l.okey, greatest(l.ls, ru.rs) AS start,
        |       least(l.le, ru.re) AS stop
        |FROM l JOIN ru ON l.okey = ru.okey
        |  AND ru.rs < l.le AND ru.re > l.ls
        |WHERE greatest(l.ls, ru.rs) < least(l.le, ru.re)""".stripMargin,
    "q_pipeline3" ->
      // whole chain: per-user span − error blackout union → segment
      // count + exact microsecond clean time (same carving walk as the
      // q_interval_subtract oracle, keyed by user)
      """WITH l AS (SELECT user_id, min(ts) AS ls, max(ts) AS le
        |           FROM events GROUP BY 1),
        |r0 AS (SELECT user_id, ts AS rs, ts + INTERVAL 1 HOUR AS re
        |       FROM events WHERE event_type = 'error'),
        |ev AS (SELECT user_id, rs, re,
        |         max(re) OVER (PARTITION BY user_id ORDER BY rs, re
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
        |       FROM r0),
        |isl AS (SELECT user_id, rs, re,
        |          sum(CASE WHEN prev_max IS NULL OR rs > prev_max THEN 1 ELSE 0 END)
        |            OVER (PARTITION BY user_id ORDER BY rs, re) AS grp
        |        FROM ev),
        |ru AS (SELECT user_id, min(rs) AS rs, max(re) AS re
        |       FROM isl GROUP BY user_id, grp),
        |m AS (SELECT l.user_id, l.ls, l.le, ru.rs, ru.re
        |      FROM l LEFT JOIN ru ON l.user_id = ru.user_id
        |        AND ru.rs < l.le AND ru.re > l.ls),
        |w AS (SELECT user_id, ls, le, rs, re,
        |        lag(re) OVER (PARTITION BY user_id ORDER BY rs) AS prev_re,
        |        row_number() OVER (PARTITION BY user_id ORDER BY rs)
        |          = count(*) OVER (PARTITION BY user_id) AS is_last
        |      FROM m),
        |seg AS (
        |  SELECT user_id, greatest(ls, coalesce(prev_re, ls)) AS s,
        |         least(le, rs) AS e
        |  FROM w WHERE rs IS NOT NULL
        |  UNION ALL
        |  SELECT user_id, greatest(ls, re) AS s, le AS e
        |  FROM w WHERE rs IS NOT NULL AND is_last
        |  UNION ALL
        |  SELECT user_id, ls AS s, le AS e FROM w WHERE rs IS NULL)
        |SELECT user_id AS uid, COUNT(*)::BIGINT AS n_segments,
        |  SUM(epoch_us(e) - epoch_us(s))::BIGINT AS clean_us
        |FROM seg WHERE s < e GROUP BY 1""".stripMargin,
    "q_fuzzy_join" -> FuzzyOracle,
    "q_fuzzy_freq" -> FuzzyOracle,
    "q_text_clean" ->
      """WITH m AS (SELECT doc_id,
        |    upper(substring(text, 1, 30)) || chr(9) || ' ' || chr(1)
        |      || substring(text, 31, 1000000) || '  ' AS messy
        |  FROM documents)
        |SELECT doc_id AS did,
        |  trim(regexp_replace(regexp_replace(lower(messy),
        |    '[\x00-\x08\x0b-\x1f\x7f]', ' ', 'g'), '\s+', ' ', 'g')) AS clean_text
        |FROM m""".stripMargin,
    "q_sample_hash" ->
      s"""SELECT doc_id AS did FROM documents
        |WHERE ('0x' || substring(md5(CONCAT_WS('#', 5, doc_id)), 1, 15))::BIGINT
        |      < $HashCut""".stripMargin,
    "q_inverted" ->
      s"""WITH p AS (SELECT DISTINCT doc_id, unnest($ToksExpr) AS token
        |           FROM documents),
        |c AS (SELECT token, doc_id,
        |        COUNT(*) OVER (PARTITION BY token) AS df,
        |        ROW_NUMBER() OVER (PARTITION BY token ORDER BY doc_id) AS rn
        |      FROM p)
        |SELECT token, df,
        |       md5(string_agg(doc_id, ',' ORDER BY doc_id)) AS digest,
        |       df > 100 AS truncated
        |FROM c WHERE df >= 2 AND rn <= 100
        |GROUP BY token, df""".stripMargin,
    "q_normalize" ->
      """SELECT l_orderkey AS okey, l_linenumber AS lnum,
        |  ROUND((l_extendedprice - AVG(l_extendedprice) OVER w)
        |        / (STDDEV_SAMP(l_extendedprice) OVER w) + 1e-9, 6) + 0.0 AS z,
        |  (l_extendedprice - MIN(l_extendedprice) OVER w)
        |    / (MAX(l_extendedprice) OVER w - MIN(l_extendedprice) OVER w) AS mm,
        |  (RANK() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice)
        |     - 1)::DOUBLE / (COUNT(l_extendedprice) OVER w - 1) AS pr
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_returnflag)""".stripMargin,
    // pipeline2: with delimiter ' ' every line IS a token, so the deduped
    // token count equals the kept-line count — no re-split needed
    "q_pipeline2" ->
      """WITH l AS (SELECT doc_id, unnest(string_split(text, ' ')) AS line
        |           FROM documents),
        |f AS (SELECT line FROM l GROUP BY line
        |      HAVING COUNT(DISTINCT doc_id) >=
        |        (SELECT CAST(ceil(0.78 * COUNT(*)) AS BIGINT) FROM documents)),
        |k AS (SELECT doc_id, COUNT(*) AS n_kept
        |      FROM l WHERE line NOT IN (SELECT line FROM f) GROUP BY doc_id),
        |t AS (SELECT d.doc_id, d.lang, d.source, COALESCE(k.n_kept, 0) AS ntok
        |      FROM documents d LEFT JOIN k USING (doc_id)),
        |r AS (SELECT *,
        |        (RANK() OVER (PARTITION BY lang ORDER BY ntok) - 1)::DOUBLE
        |          / (COUNT(ntok) OVER (PARTITION BY lang) - 1) AS pr
        |      FROM t)
        |SELECT lang, source, COUNT(*) AS n,
        |       ROUND(AVG(ntok) + 1e-9, 6) + 0.0 AS avg_ntok
        |FROM r WHERE pr >= 0.25 GROUP BY 1, 2""".stripMargin,
    "q_sample_weighted" ->
      """WITH s AS (SELECT doc_id, n_chars,
        |  ln((('0x' || substring(md5(CONCAT_WS('#', 7, doc_id)), 1, 15))::BIGINT
        |      + 1.0) / 1152921504606846976.0) / n_chars AS key
        |  FROM documents)
        |SELECT doc_id AS did, n_chars
        |FROM s ORDER BY key DESC, doc_id LIMIT 50""".stripMargin,
    "q_csv_roundtrip" ->
      "SELECT event_id, ts, user_id, event_type, value, props FROM events",
    "q_orc_roundtrip" ->
      """SELECT event_id, ts, user_id, event_type, value, props
        |FROM events WHERE event_type <> 'click'""".stripMargin,
    "q_layout_scan" ->
      """SELECT date_trunc('month', l_shipdate) AS m,
        |       COUNT(*) AS n, SUM(l_quantity) AS q
        |FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1""".stripMargin,
    "q_winsorize" ->
      """WITH b AS (SELECT l_returnflag,
        |             quantile_cont(l_extendedprice, 0.05) AS qlo,
        |             quantile_cont(l_extendedprice, 0.95) AS qhi
        |           FROM lineitem GROUP BY 1)
        |SELECT l.l_orderkey AS okey, l.l_linenumber AS lnum,
        |  ROUND(LEAST(GREATEST(l.l_extendedprice, b.qlo), b.qhi) + 1e-9, 6)
        |    + 0.0 AS vw,
        |  ROUND(b.qlo + 1e-9, 6) + 0.0 AS lo,
        |  ROUND(b.qhi + 1e-9, 6) + 0.0 AS hi
        |FROM lineitem l JOIN b USING (l_returnflag)""".stripMargin,
  )
}
