package graft.resample

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType, LongType, TimestampNTZType, TimestampType}

/** EAV window resampling — Spark-native reimplementation of the reference's
  * `resample_eav` (`/root/reference/catabra_pandas/resampling.py:25-450`).
  *
  * Input is a long entity–attribute–value table of timestamped observations
  * and a table of per-entity `[start, stop)` windows (closedness
  * configurable; either endpoint may be globally absent = ±∞, or NA = the
  * window is invalid and contains nothing). For every window and every
  * requested `(attribute, aggregation)` pair one output column
  * `{attribute}_{agg}` is appended to the windows frame.
  *
  * Aggregations (`resampling.py:69-96`): mean, min, max, median, std, var,
  * sum, prod, skew, mad, sem, size, count, nunique, mode, mode_count,
  * `pXX` (percentile, XX ∈ [0,100]), `rXX` / `tXX` (value / time of the
  * XX-th observation by time, 0-based, negative = from the end,
  * out-of-range ⇒ NA).
  *
  * Deviations from the reference, documented per SURVEY.md §1.2/§7.4:
  *   - count-like aggs (`size`/`count`/`nunique`/`mode_count`) are
  *     `LongType` (reference: float64), 0 for empty windows (same);
  *   - mode ties break deterministically by value ascending (reference:
  *     "randomly but reproducibly", `misc.py:930-933`);
  *   - rank-agg time ties break by a stable observation row id
  *     (`method="first"`, `resampling.py:2025`);
  *   - `std`/`var`/`sem` need ≥2 and `skew` ≥3 observations, else null
  *     (pandas: NaN — null is the Spark-native spelling);
  *   - `skew` is pandas' adjusted Fisher–Pearson `G1`, obtained from
  *     Spark's population `skewness` via `sqrt(n(n-1))/(n-2)`.
  *
  * Architecture (replaces the reference's join-vs-group strategy machinery,
  * `resampling.py:1272-1400`, which is an execution-memory workaround Spark
  * does not need — AQE and spillable hash aggregation take its place):
  * one equi-join on entity with the time-containment range conjunct as
  * post-filter, then up to three aggregation family plans over the joined
  * long frame — standard (single hash agg, with an analytic-window mean
  * pre-pass only when `mad` is requested), mode (count + window top-1), and
  * rank (two `row_number` window passes sharing one shuffle) — merged on
  * `(window, attribute)` and pivoted to wide columns by conditional
  * aggregation. Every shuffle is keyed by the window id, so partial
  * aggregation happens map-side and skew is handled by AQE.
  */
object ResampleEav {

  private val Wid   = "__graft_wid"
  private val Attr  = "__graft_attr"
  private val Oid   = "__graft_oid"
  private val VCol  = "__graft_v"
  private val TCol  = "__graft_t"

  private val PercentRe = """p(\d+(?:\.\d+)?)""".r
  private val RankRe    = """([rt])(-?\d+)""".r

  private sealed trait AggKind
  private case class Std(name: String)            extends AggKind
  private case class Pct(q: Double)               extends AggKind
  private case class Rank(k: Int, time: Boolean)  extends AggKind
  private case object Mode                        extends AggKind
  private case object ModeCount                   extends AggKind

  private def parse(agg: String): AggKind = agg match {
    case "mode"       => Mode
    case "mode_count" => ModeCount
    case "median"     => Pct(0.5)
    case PercentRe(x) => Pct(x.toDouble / 100.0)
    case RankRe(rt, k) => Rank(k.toInt, rt == "t")
    case s if StdNames(s) => Std(s)
    case other => throw new IllegalArgumentException(s"unknown agg '$other'")
  }

  private val StdNames = Set("mean", "min", "max", "std", "var", "sum",
    "prod", "skew", "mad", "sem", "size", "count", "nunique")

  private val CountLike = Set("size", "count", "nunique", "mode_count")

  /** @param obs        observations: `timeCol`, `valueCol`, `entityCol?`,
    *                   `attrCol?`
    * @param windows    windows: `entityCol?`, `wStartCol?`, `wStopCol?` plus
    *                   arbitrary carried columns
    * @param agg        attribute → list of aggregation names (see above);
    *                   when `attrCol` is None, must have exactly one key
    * @param includeStart window start times belong to the window
    * @param includeStop  window stop times belong to the window
    * @param customAgg  attribute → custom aggregations (name, builder over
    *                   the (value, time) columns) — see [[CustomAgg]]
    * @param approx     scale opt-in (SURVEY.md §2.4): `pXX`/`median` use
    *                   `approx_percentile` and `nunique` uses
    *                   `approx_count_distinct` — sketch-mergeable partial
    *                   aggregation instead of exact per-group state (the
    *                   exact percentile buffers every value; exact
    *                   distinct triggers an Expand). Results are
    *                   approximate — keep `false` when oracle-comparing
    * @param optimize   API parity with the reference's
    *                   `optimize="time"/"memory"` (resampling.py:113-118),
    *                   which sizes ITS hand-built join/sort batches
    *                   (`MAX_ROWS`). Validated, then ignored: Spark sizes
    *                   and spills those batches itself (Tungsten
    *                   spillable aggregation + AQE), so both spellings
    *                   produce the identical plan; the genuine
    *                   memory-for-accuracy knob here is `approx`
    * @return `windows` + one `{attr}_{agg}` column per requested pair
    */
  def apply(
      obs: DataFrame,
      windows: DataFrame,
      agg: Map[String, Seq[String]],
      timeCol: String,
      valueCol: String,
      entityCol: Option[String] = None,
      attrCol: Option[String] = None,
      wStartCol: Option[String] = None,
      wStopCol: Option[String] = None,
      includeStart: Boolean = true,
      includeStop: Boolean = false,
      customAgg: Map[String, Seq[CustomAgg.Spec]] = Map.empty,
      approx: Boolean = false,
      optimize: String = "time"): DataFrame = {

    require(optimize == "time" || optimize == "memory",
      s"optimize must be 'time' or 'memory', got '$optimize'")
    require(agg.nonEmpty || customAgg.nonEmpty, "empty agg spec")
    require(attrCol.isDefined || (agg.keySet ++ customAgg.keySet).size == 1,
      "attrCol=None requires a single-attribute agg spec")
    require(wStartCol.isDefined || wStopCol.isDefined,
      "at least one window endpoint column required")
    val spec: Seq[(String, Seq[(String, AggKind)])] =
      agg.toSeq.sortBy(_._1).map { case (a, gs) =>
        a -> gs.map(g => g -> parse(g))
      }
    val kinds: Seq[AggKind] = spec.flatMap(_._2.map(_._2)).distinct
    val allAttrs: Seq[String] =
      (agg.keySet ++ customAgg.keySet).toSeq.sorted

    // ── normalize observations ──────────────────────────────────────────
    // NaN values are NA in pandas but ordinary (maximal) values to Spark
    // aggregates — normalize NaN→null at ingress (SURVEY.md §7.4).
    val vIsFloat = obs.schema(valueCol).dataType match {
      case DoubleType | FloatType => true
      case _                      => false
    }
    val vNorm =
      if (vIsFloat) when(isnan(col(valueCol)), lit(null)).otherwise(col(valueCol))
      else col(valueCol)

    // NaN sorts ABOVE +Inf in Spark, so a NaN time/endpoint would pass
    // `<`/`<=` guards that nulls fail — treat NaN as NA explicitly
    // (pandas isna covers NaN; SURVEY.md §7.4)
    def notNaN(df0: DataFrame, c: String): Column =
      df0.schema(c).dataType match {
        case DoubleType | FloatType => !isnan(col(c))
        case _                      => lit(true)
      }

    val attrExpr = attrCol.map(col).getOrElse(lit(allAttrs.head))
    val obsKeep = Seq(
      Some(col(timeCol).isNotNull && notNaN(obs, timeCol)),
      attrCol.map(a => col(a).isin(allAttrs: _*))
    ).flatten.reduce(_ && _)

    val obsN = obs
      .filter(obsKeep)
      .withColumn(Oid, monotonically_increasing_id())
      .select(
        (entityCol.map(col).toSeq :+
          attrExpr.as(Attr) :+ col(timeCol).as(TCol) :+
          vNorm.as(VCol) :+ col(Oid)): _*)

    val w0 = windows.withColumn(Wid, monotonically_increasing_id())

    // ── join: entity equality + time ∈ window ───────────────────────────
    val ePrefix = "__graft_e_"
    val obsR = entityCol.fold(obsN)(e => obsN.withColumnRenamed(e, ePrefix + e))
    val keyCond = entityCol.map(e => col(e) === col(ePrefix + e))
    val lo = wStartCol.map(c =>
      (if (includeStart) col(c) <= col(TCol) else col(c) < col(TCol)) &&
        notNaN(windows, c))
    val hi = wStopCol.map(c =>
      (if (includeStop) col(TCol) <= col(c) else col(TCol) < col(c)) &&
        notNaN(windows, c))
    val cond = (keyCond.toSeq ++ lo ++ hi).reduce(_ && _)

    val joined = w0
      .select((col(Wid) +: (entityCol.map(col).toSeq ++ wStartCol.map(col) ++ wStopCol.map(col))): _*)
      .join(obsR, cond, "inner")
      .select(col(Wid), col(Attr), col(TCol), col(VCol), col(Oid))

    val v = col(VCol)

    // ── family A: standard aggs (one hash agg; mad needs a mean pre-pass)
    val stdKeys: Seq[String] = kinds.collect { case Std(n) => n }
    val pcts: Seq[Double]    = kinds.collect { case Pct(q) => q }
    val needMad = stdKeys.contains("mad")

    val famStd: Option[DataFrame] =
      if (stdKeys.isEmpty && pcts.isEmpty) None
      else {
        // exact pXX via a per-group sort + row_number + linear
        // interpolation (pandas formula: lower + (upper-lower)·g). The
        // built-in `percentile` is a TypedImperativeAggregate that buffers
        // every value per group and falls back to sort-based aggregation
        // beyond 128 in-memory groups — this plan stays inside
        // whole-stage-codegen hash aggregation + a spillable Tungsten
        // sort, which survives memory pressure at scale.
        val needExactPct = pcts.nonEmpty && !approx
        val base0 =
          if (needMad)
            joined.withColumn("__graft_vmean",
              avg(v).over(Window.partitionBy(Wid, Attr)))
          else joined
        val base =
          if (needExactPct) {
            val byV = Window.partitionBy(Wid, Attr).orderBy(v.asc_nulls_last)
            base0
              .withColumn("__graft_vrn", row_number().over(byV))
              .withColumn("__graft_vn",
                count(v).over(Window.partitionBy(Wid, Attr)))
          } else base0
        val n  = count(v)
        val exprs: Seq[Column] = stdKeys.map {
          case "mean" => avg(v).as("mean")
          case "min"  => min(v).as("min")
          case "max"  => max(v).as("max")
          case "sum"  => sum(v).as("sum")
          case "prod" => product(v).as("prod")
          case "std"  => when(n >= 2, stddev_samp(v)).as("std")
          case "var"  => when(n >= 2, var_samp(v)).as("var")
          case "sem"  => when(n >= 2, stddev_samp(v) / sqrt(n)).as("sem")
          case "skew" =>
            when(n >= 3,
              skewness(v) * sqrt(n.cast(DoubleType) * (n - 1)) / (n - 2))
              .as("skew")
          case "mad"  => avg(abs(v - col("__graft_vmean"))).as("mad")
          case "size" => count(lit(1)).as("size")
          case "count"   => n.as("count")
          case "nunique" =>
            (if (approx) approx_count_distinct(v) else count_distinct(v))
              .as("nunique")
        } ++ (
          if (approx)
            pcts.map(q => percentile_approx(v, lit(q), lit(10000)).as(pctName(q)))
          else
            pcts.flatMap { q =>
              // per-row: pos = (n-1)·q is constant within the group, so the
              // floor/ceil rank hits are per-row predicates and the whole
              // family reduces to conditional max()es
              val pos = (col("__graft_vn") - 1).cast(DoubleType) * lit(q)
              Seq(
                max(when(col("__graft_vrn") === (floor(pos) + 1), v))
                  .as(s"__graft_plo_${pctName(q)}"),
                max(when(col("__graft_vrn") === (ceil(pos) + 1), v))
                  .as(s"__graft_phi_${pctName(q)}"),
                (max(pos) - floor(max(pos))).as(s"__graft_pg_${pctName(q)}"))
            })
        val aggd = base.groupBy(col(Wid), col(Attr)).agg(exprs.head, exprs.tail: _*)
        val withPct =
          if (approx || pcts.isEmpty) aggd
          else pcts.foldLeft(aggd) { (d, q) =>
            val nm = pctName(q)
            d.withColumn(nm,
                col(s"__graft_plo_$nm") +
                  (col(s"__graft_phi_$nm") - col(s"__graft_plo_$nm")) *
                  col(s"__graft_pg_$nm"))
              .drop(s"__graft_plo_$nm", s"__graft_phi_$nm", s"__graft_pg_$nm")
          }
        Some(withPct)
      }

    // ── family B: mode (deterministic ties: count desc, value asc) ──────
    val famMode: Option[DataFrame] =
      if (!kinds.exists(k => k == Mode || k == ModeCount)) None
      else {
        val counts = joined.filter(v.isNotNull)
          .groupBy(col(Wid), col(Attr), v).agg(count(lit(1)).as("__graft_n"))
        val rankW = Window.partitionBy(Wid, Attr)
          .orderBy(col("__graft_n").desc, v.asc)
        Some(counts
          .withColumn("__graft_rn", row_number().over(rankW))
          .filter(col("__graft_rn") === 1)
          .select(col(Wid), col(Attr),
            v.as("mode"), col("__graft_n").as("mode_count")))
      }

    // ── family C: rank aggs (rXX/tXX; ties by (time, oid)) ──────────────
    val ranks: Seq[Int] = kinds.collect { case Rank(k, _) => k }.distinct
    val famRank: Option[DataFrame] =
      if (ranks.isEmpty) None
      else {
        val asc  = Window.partitionBy(Wid, Attr).orderBy(col(TCol).asc, col(Oid).asc)
        val desc = Window.partitionBy(Wid, Attr).orderBy(col(TCol).desc, col(Oid).desc)
        val withRn = joined
          .withColumn("__graft_ra", row_number().over(asc))
          .withColumn("__graft_rd", row_number().over(desc))
        val exprs: Seq[Column] = ranks.flatMap { k =>
          val hit =
            if (k >= 0) col("__graft_ra") === (k + 1)
            else col("__graft_rd") === -k
          Seq(
            max(when(hit, v)).as(rankName(k, time = false)),
            max(when(hit, col(TCol))).as(rankName(k, time = true)))
        }
        Some(withRn.groupBy(col(Wid), col(Attr)).agg(exprs.head, exprs.tail: _*))
      }

    // ── family D: custom aggregations (CustomAgg.Spec hooks) ────────────
    val famCustom: Option[DataFrame] =
      if (customAgg.isEmpty) None
      else {
        val exprs: Seq[Column] = for {
          (a, specs) <- customAgg.toSeq.sortBy(_._1)
          (nm, f)    <- specs
        } yield f(v, col(TCol)).as(s"cust__${a}__$nm")
        Some(joined.groupBy(col(Wid), col(Attr)).agg(exprs.head, exprs.tail: _*))
      }

    // ── merge families on (wid, attr); all are small (≤ windows×attrs) ──
    val fams = Seq(famStd, famMode, famRank, famCustom).flatten
    val merged = fams.reduce((a, b) => a.join(b, Seq(Wid, Attr), "full_outer"))

    // ── pivot to wide by conditional aggregation ────────────────────────
    def famCol(kind: AggKind): String = kind match {
      case Std(nm)     => nm
      case Pct(q)      => pctName(q)
      case Rank(k, t)  => rankName(k, t)
      case Mode        => "mode"
      case ModeCount   => "mode_count"
    }
    val pivotExprs: Seq[Column] = (for {
      (a, gs)    <- spec
      (gName, k) <- gs
    } yield max(when(col(Attr) === a, col(famCol(k)))).as(s"${a}_$gName")) ++
      (for {
        (a, specs) <- customAgg.toSeq.sortBy(_._1)
        (nm, _)    <- specs
      } yield max(when(col(Attr) === a, col(s"cust__${a}__$nm"))).as(s"${a}_$nm"))

    val wide = merged.groupBy(col(Wid))
      .agg(pivotExprs.head, pivotExprs.tail: _*)

    val out = w0.join(wide, Seq(Wid), "left")
    val filled = spec.foldLeft(out) { case (d, (a, gs)) =>
      gs.foldLeft(d) { case (d2, (gName, _)) =>
        if (CountLike(gName))
          d2.withColumn(s"${a}_$gName",
            coalesce(col(s"${a}_$gName").cast(LongType), lit(0L)))
        else d2
      }
    }
    filled.drop(Wid)
  }

  private def pctName(q: Double): String = {
    val x = q * 100
    if (x == x.floor) s"p${x.toInt}" else s"p$x"
  }
  private def rankName(k: Int, time: Boolean): String =
    (if (time) "t" else "r") + k.toString

  /** One observation handed to the [[flatMapWindows]] callable: attribute
    * plus time and value cast to double (timestamps become epoch
    * seconds; a missing/NaN value arrives as `Double.NaN`, the pandas NA
    * spelling the reference callable sees).
    */
  final case class FlatObs(attr: String, t: Double, v: Double)

  /** Escape hatch for genuinely non-aggregable custom window shapes —
    * the reference's callable agg may emit ARBITRARY output columns
    * (`resampling.py:257-273` probes the callable's output schema); the
    * expression-based [[CustomAgg]] hook covers multi-column scalar
    * aggs, and this covers the rest: per window, `f` receives all the
    * window's observations sorted by `(t, attr, v)` and emits zero or
    * more rows of the DECLARED case-class type `U` (Spark needs the
    * schema up front where pandas probes it). The result is the windows
    * frame inner-joined to the emissions — a window whose observation
    * set is empty emits nothing.
    *
    * Scale posture: one equi-join shuffle on entity, one `groupByKey`
    * shuffle on the window id; each window's observations are
    * materialized in memory for the callable — the same per-window
    * bound as the reference's pandas sub-frame (`resampling.py:1875+`).
    */
  def flatMapWindows[U <: Product](
      obs: DataFrame,
      windows: DataFrame,
      timeCol: String,
      valueCol: String,
      entityCol: Option[String] = None,
      attrCol: Option[String] = None,
      wStartCol: Option[String] = None,
      wStopCol: Option[String] = None,
      includeStart: Boolean = true,
      includeStop: Boolean = false,
      attributes: Seq[String] = Nil)(
      f: Seq[FlatObs] => IterableOnce[U])(
      implicit encU: org.apache.spark.sql.Encoder[U]): DataFrame = {
    require(wStartCol.isDefined || wStopCol.isDefined,
      "at least one window endpoint column required")
    require(attrCol.isDefined || attributes.size <= 1,
      "attrCol=None cannot filter to multiple attributes")

    import org.apache.spark.sql.{Encoder, Encoders}

    val vIsFloat = obs.schema(valueCol).dataType match {
      case DoubleType | FloatType => true
      case _                      => false
    }
    val vNorm =
      if (vIsFloat) when(isnan(col(valueCol)), lit(null)).otherwise(col(valueCol))
      else col(valueCol)
    def notNaN(df0: DataFrame, c: String): Column =
      df0.schema(c).dataType match {
        case DoubleType | FloatType => !isnan(col(c))
        case _                      => lit(true)
      }

    // TIMESTAMP_NTZ has no direct double cast — hop through TIMESTAMP
    // (session timezone is fixed, so the hop is deterministic)
    def asDouble(df0: DataFrame, c: String): Column =
      df0.schema(c).dataType match {
        case TimestampNTZType => col(c).cast(TimestampType).cast("double")
        case _                => col(c).cast("double")
      }

    val attrExpr = attrCol.map(col).getOrElse(lit(""))
    val obsKeep = (Seq(col(timeCol).isNotNull && notNaN(obs, timeCol)) ++
      (if (attributes.nonEmpty) attrCol.map(a => col(a).isin(attributes: _*))
       else None)).reduce(_ && _)
    val obsN = obs
      .filter(obsKeep)
      .select(
        (entityCol.map(col).toSeq :+
          attrExpr.cast("string").as(Attr) :+
          asDouble(obs, timeCol).as(TCol) :+
          coalesce(vNorm.cast("double"), lit(Double.NaN)).as(VCol)): _*)

    val w0 = windows.withColumn(Wid, monotonically_increasing_id())
    val ePrefix = "__graft_e_"
    val obsR = entityCol.fold(obsN)(e => obsN.withColumnRenamed(e, ePrefix + e))
    val keyCond = entityCol.map(e => col(e) === col(ePrefix + e))
    // obs time was cast to double at ingress; compare in double space
    // (epoch micros fit double's 53-bit mantissa, so the cast is exact)
    val lo = wStartCol.map(c =>
      (if (includeStart) asDouble(windows, c) <= col(TCol)
       else asDouble(windows, c) < col(TCol)) &&
        notNaN(windows, c))
    val hi = wStopCol.map(c =>
      (if (includeStop) col(TCol) <= asDouble(windows, c)
       else col(TCol) < asDouble(windows, c)) &&
        notNaN(windows, c))
    val cond = (keyCond.toSeq ++ lo ++ hi).reduce(_ && _)

    val joined = w0
      .select((col(Wid) +: (entityCol.map(col).toSeq ++
        wStartCol.map(col) ++ wStopCol.map(col))): _*)
      .join(obsR, cond, "inner")
      .select(col(Wid), col(Attr), col(TCol), col(VCol))

    implicit val encIn: Encoder[(Long, String, Double, Double)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.STRING,
        Encoders.scalaDouble, Encoders.scalaDouble)
    implicit val encKey: Encoder[Long] = Encoders.scalaLong
    implicit val encOut: Encoder[(Long, U)] =
      Encoders.tuple(Encoders.scalaLong, encU)
    val emitted = joined.as[(Long, String, Double, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (wid: Long, it: Iterator[(Long, String, Double, Double)]) =>
        val os = it.map(r => FlatObs(r._2, r._3, r._4)).toVector
          .sortBy(o => (o.t, o.attr, o.v))
        f(os).iterator.map(u => (wid, u))
      }
      .toDF("__graft_widk", "__graft_u")
      .select(col("__graft_widk").as(Wid), col("__graft_u.*"))

    w0.join(emitted, Seq(Wid), "inner").drop(Wid)
  }
}
