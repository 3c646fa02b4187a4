package graft.joins

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, TimestampNTZType, TimestampType}

/** Binned (bucketed) interval-overlap join — the scale path for interval
  * joins WITHOUT equality keys (SURVEY.md §4: the reference decomposes
  * keyless overlap into two sorted containment sweeps,
  * `merging.py:437-496`; the Spark-native equivalent of that rewrite is
  * bin bucketing, the same idea as Databricks' range-join binning).
  *
  * A keyless interval join in plain Spark degenerates to a broadcast
  * nested-loop / cartesian product — O(|L|·|R|). Binning rewrites it as an
  * equi-join: every interval is exploded to the integer bins it touches,
  * the join runs on the bin id (hash-partitionable, AQE-skew-splittable),
  * and each overlapping pair is counted exactly once by keeping only the
  * bin that contains the overlap's start point (`greatest(l.start,
  * r.start)`) — a pure DataFrame-level rewrite, no custom strategy.
  *
  * Cost: |rows| × (interval length / binWidth) exploded rows; pick
  * `binWidth` near the typical interval length so most intervals touch
  * 1-2 bins. Both sides must be bounded (finite endpoints).
  */
object BinnedIntervalJoin {

  /** Bin index expression for numeric/timestamp/date endpoints. */
  private[joins] def binOf(c: Column, dt: org.apache.spark.sql.types.DataType,
      width: Double): Column = {
    val m = dt match {
      case TimestampType    => unix_micros(c).cast("double")
      case TimestampNTZType => unix_micros(c.cast(TimestampType)).cast("double")
      case DateType         => unix_date(c).cast("double") * 86400e6
      case _                => c.cast("double")
    }
    floor(m / width).cast("long")
  }

  /** `binWidth` scale factor: timestamp/date bins count in seconds. */
  private[joins] def widthFor(dt: org.apache.spark.sql.types.DataType,
      binWidth: Double): Double = dt match {
    case TimestampType | TimestampNTZType | DateType => binWidth * 1e6
    case _ => binWidth
  }

  /** `binWidth` in the endpoint's natural units: seconds for
    * timestamp/date columns, the raw value for numerics.
    *
    * @param left    bounded intervals `[lStart, lStop]` (closed)
    * @param right   bounded intervals `[rStart, rStop]` (closed)
    * @param on      equality-key columns present in BOTH inputs; the join
    *                then runs on (keys, bin) — even WITH keys this beats
    *                the plain equi-join + range-post-filter plan whenever
    *                keys are coarse (the post-filter degenerates to a
    *                per-key cartesian: 10k groups × 1k×100 rows = 1e9
    *                pair evaluations, vs ~|output| after binning)
    * @return matched pairs with all columns of both inputs (right columns
    *         suffixed `_r` when names collide)
    */
  def apply(
      left: DataFrame,
      right: DataFrame,
      lStart: String, lStop: String,
      rStart: String, rStop: String,
      binWidth: Double,
      on: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val dt = left.schema(lStart).dataType
    val width = widthFor(dt, binWidth)

    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    val rRenamed = overlap.foldLeft(right)((d, c) => d.withColumnRenamed(c, c + "_r"))
    def rName(c: String): String = if (overlap(c)) c + "_r" else c

    // NaN endpoints: `NaN <= NaN` is true in Spark, so without an explicit
    // guard a [NaN, NaN] interval would pass the validity filter, bin to
    // floor(NaN) = 0 and spuriously match other NaN intervals. The
    // reference treats any-NaN intervals as empty (merging.py:138-139) —
    // mirror Intervals.nonEmpty's notNaNNotNull here.
    def validIv(d: DataFrame, a: String, b: String): Column = {
      def ok(c: String): Column = d.schema(c).dataType match {
        case org.apache.spark.sql.types.DoubleType |
             org.apache.spark.sql.types.FloatType =>
          col(c).isNotNull && !isnan(col(c))
        case _ => col(c).isNotNull
      }
      ok(a) && ok(b) && col(a) <= col(b)
    }
    val lValid = left.filter(validIv(left, lStart, lStop))
    val rValid = rRenamed.filter(validIv(rRenamed, rName(rStart), rName(rStop)))

    val lBinned = lValid.withColumn("__graft_bin",
      explode(sequence(binOf(col(lStart), dt, width), binOf(col(lStop), dt, width))))
    val rBinned = rValid.withColumn("__graft_rbin",
      explode(sequence(binOf(col(rName(rStart)), dt, width),
        binOf(col(rName(rStop)), dt, width))))

    // equi-join on (keys, bin); true overlap check; count each pair
    // exactly once — in the bin holding the overlap's start point
    val anchor = binOf(greatest(col(lStart), col(rName(rStart))), dt, width)
    // <=> (null-safe), matching keyed IntervalJoin: rows with null keys
    // match each other there, so they must here too (the bin-explosion
    // equi-conjuncts are never null — endpoints are validity-filtered)
    val keyConds = on.map(k => col(k) <=> col(rName(k)))
    lBinned.join(rBinned,
        (keyConds :+
          (col("__graft_bin") === col("__graft_rbin")) :+
          (col(lStart) <= col(rName(rStop))) :+
          (col(rName(rStart)) <= col(lStop)) :+
          (col("__graft_bin") === anchor)).reduce(_ && _))
      .drop("__graft_bin", "__graft_rbin")
  }
}

/** As-of join — the pandas `merge_asof` analog the reference cross-
  * references (`merging.py:117-120`): for every left row, the single
  * nearest right row at-or-before (`backward`) / at-or-after (`forward`)
  * the left timestamp, optionally within `tolerance` and per equality
  * keys. Built on the interval-join + window-dedup mechanism
  * ([[IntervalJoin]] `keep=first/last`, SURVEY.md §2.3).
  */
object AsOfJoin {

  /** @param direction "backward" (right.time <= left.time, take latest) or
    *                  "forward" (right.time >= left.time, take earliest)
    * @param tolerance  max |left.time − right.time| as a Column interval /
    *                  numeric delta; None = unbounded
    */
  def apply(
      left: DataFrame,
      right: DataFrame,
      leftTime: String,
      rightTime: String,
      on: Seq[String] = Nil,
      direction: String = "backward",
      tolerance: Option[Column] = None): DataFrame = {
    require(Seq("backward", "forward").contains(direction), s"direction=$direction")

    // as-of = interval join where the left "interval" extends from the
    // time minus/plus tolerance to the time, right side is a point, and
    // keep takes the right row nearest the boundary (by right time order)
    val lo = "__graft_asof_lo"
    val hi = "__graft_asof_hi"
    val prepared = direction match {
      case "backward" =>
        left
          .withColumn(hi, col(leftTime))
          .withColumn(lo, tolerance.map(t => col(leftTime) - t)
            .getOrElse(lit(null)))
      case "forward" =>
        left
          .withColumn(lo, col(leftTime))
          .withColumn(hi, tolerance.map(t => col(leftTime) + t)
            .getOrElse(lit(null)))
    }
    val spec = graft.core.IntervalSpec(
      if (tolerance.isDefined || direction == "forward") Some(lo) else None,
      if (tolerance.isDefined || direction == "backward") Some(hi) else None)
    // nearest by right's time: order the window dedup by a time-ordered id
    val ordered = right.orderBy(col(rightTime).asc)
    IntervalJoin(
      prepared, ordered,
      leftSpec = spec,
      rightSpec = graft.core.IntervalSpec.point(rightTime),
      on = on,
      how = "left",
      keep = if (direction == "backward") "last" else "first",
      keepOrder = false)
      .drop(lo, hi)
  }
}
