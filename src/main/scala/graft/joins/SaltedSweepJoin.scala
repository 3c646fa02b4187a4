package graft.joins

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, TimestampNTZType, TimestampType}

import graft.core.IntervalSpec

/** Hot-key time-skew composition for the sweep join.
  *
  * The plain sweep hash-clusters on the equality keys, so one dominant
  * key (a mega-entity — exactly the shape `Profile.keySkew` detects)
  * lands on a single task: the sweep's `maxActive` degrade bounds
  * MEMORY on such a key, but not WALL-TIME — at 100× scale a skewed
  * key makes the sweep a stragglers' operator. This wrapper restores
  * parallelism by TIME-SLICING hot keys, which the interval predicate
  * makes cheaper than classic s-way salting:
  *
  *   - per hot key (left row count > `hotKeyThreshold`, found by one
  *     count-only aggregation), the LEFT start domain `[mn, mx]` is cut
  *     into `slices` uniform ranges; every left row goes to exactly ONE
  *     slice by its start — so output multiplicity and `keep`
  *     first/last/both semantics are untouched (all of a left row's
  *     matches meet it in its slice);
  *   - a RIGHT row `[rs, re]` is replicated only to the slices it can
  *     reach: slice `i` holds left rows with `ls ∈ [b_i, b_{i+1})`, so
  *     a match needs `re ≥ ls ≥ b_i` and `rs ≤ le ≤ ls + D < b_{i+1} +
  *     D` (`D` = the key's max left duration, from the same stats
  *     pass) — i.e. slices `⌊(rs−D−mn)/W⌋ … ⌊(re−mn)/W⌋`, widened by
  *     one on each side to absorb double rounding (over-replication is
  *     harmless: a pair can only MEET in the left row's single slice;
  *     under-replication would lose pairs, so the widening errs safe).
  *     Classic salting replicates the right side to ALL s slices; here
  *     short right intervals land in O(1 + span/W) of them;
  *   - non-hot keys take slice 0 on both sides — their plan is the
  *     plain sweep's (same shuffle keys modulo the constant salt).
  *
  * The sweep then runs on keys ⧺ slice. Everything is driven by one
  * driver-collected stats frame bounded by `maxHotKeys` rows, and the
  * result is bit-identical to [[SweepJoin]] (specced; the driver query
  * shares the plain range-join oracle).
  */
object SaltedSweepJoin {

  /** @param slices          time slices per hot key (the parallelism a
    *                        hot key's sweep recovers)
    * @param hotKeyThreshold left rows per key above which the key is
    *                        sliced; pick ~rows-per-healthy-task
    * @param maxHotKeys      refuse (loudly) if more keys than this are
    *                        hot — that is not skew, that is a
    *                        mis-sized threshold
    */
  def apply(left: DataFrame, right: DataFrame,
            leftOn: Seq[String], rightOn: Seq[String],
            leftSpec: IntervalSpec, rightSpec: IntervalSpec,
            slices: Int = 8,
            hotKeyThreshold: Long = 2000000L,
            maxHotKeys: Int = 10000,
            keep: String = "all",
            rightOrderCol: Option[String] = None): DataFrame = {
    require(slices >= 2, "slices >= 2 (1 would be the plain sweep)")
    require(leftOn.nonEmpty, "salting needs equality keys")
    require(leftOn.length == rightOn.length,
      s"key lists must align: $leftOn vs $rightOn")

    val lS = leftSpec.start.get; val lE = leftSpec.stop.get
    val rS = rightSpec.start.get; val rE = rightSpec.stop.get

    // endpoint → double metric for slice arithmetic only (the join
    // itself compares the ORIGINAL columns; rounding here only shifts
    // slice boundaries, which the ±1 widening absorbs)
    def metric(df: DataFrame, c: String): Column = df.schema(c).dataType match {
      case TimestampType    => unix_micros(col(c)).cast("double")
      case TimestampNTZType => unix_micros(col(c).cast(TimestampType)).cast("double")
      case DateType         => unix_date(col(c)).cast("double")
      case _                => col(c).cast("double")
    }

    // same ingress filter as the sweep, so the stats see the rows the
    // sweep will see
    val lValid = left.filter(graft.core.Intervals.nonEmpty(left, leftSpec))
    val rValid = right.filter(graft.core.Intervals.nonEmpty(right, rightSpec))

    // ── one count-only stats pass over the left side ──────────────────
    val hot = lValid.groupBy(leftOn.map(col): _*)
      .agg(count(lit(1)).as("__ss_n"),
        min(metric(left, lS)).as("__ss_mn"),
        max(metric(left, lS)).as("__ss_mx"),
        max(metric(left, lE) - metric(left, lS)).as("__ss_d"))
      .filter(col("__ss_n") > hotKeyThreshold)
      .drop("__ss_n")
    val nHot = hot.limit(maxHotKeys + 1).count()
    require(nHot <= maxHotKeys,
      s"more than $maxHotKeys keys exceed hotKeyThreshold=$hotKeyThreshold " +
        "left rows; raise the threshold — slicing every key is just a " +
        "more expensive shuffle")
    if (nHot == 0) {
      // nothing hot: identical plan to the plain sweep, zero overhead
      return SweepJoin(left, right, leftOn, rightOn, leftSpec, rightSpec,
        keep = keep, rightOrderCol = rightOrderCol)
    }

    // slice width: span/slices (fractional domains slice exactly as
    // well as integral ones — the assignment below clamps the top
    // boundary); zero-span keys degenerate to one slice via the floor
    val w = greatest((col("__ss_mx") - col("__ss_mn")) / slices, lit(1e-9))

    val hotL = broadcast(hot.withColumn("__ss_w", w)
      .select((leftOn.map(col) :+ col("__ss_mn") :+ col("__ss_d") :+
        col("__ss_w")): _*))
    val hotR = leftOn.zip(rightOn).foldLeft(hotL) { case (d, (lc, rc)) =>
      if (lc == rc) d else d.withColumnRenamed(lc, rc)
    }

    // ── left: exactly one slice per row ────────────────────────────────
    val lSalted = lValid.join(hotL, leftOn, "left")
      .withColumn("__ss_salt",
        when(col("__ss_mn").isNull, lit(0))
          .otherwise(least(lit(slices - 1), greatest(lit(0),
            floor((metric(left, lS) - col("__ss_mn")) / col("__ss_w"))))
            .cast("int")))
      .select((left.columns.map(col) :+ col("__ss_salt")): _*)

    // ── right: replicate hot-key rows to reachable slices only ────────
    val lo = greatest(lit(0),
      floor((metric(right, rS) - col("__ss_d") - col("__ss_mn")) / col("__ss_w")) - 1)
    val hi = least(lit(slices - 1),
      floor((metric(right, rE) - col("__ss_mn")) / col("__ss_w")) + 1)
    val saltArr = when(col("__ss_mn").isNull, array(lit(0)))
      .otherwise(when(lo <= hi, sequence(lo.cast("int"), hi.cast("int")))
        .otherwise(array().cast("array<int>")))
    val rSalted = rValid.join(hotR, rightOn, "left")
      .withColumn("__ss_salt", explode(saltArr))
      .select((right.columns.map(col) :+ col("__ss_salt")): _*)

    SweepJoin(lSalted, rSalted.withColumnRenamed("__ss_salt", "__ss_salt_r"),
      leftOn :+ "__ss_salt", rightOn :+ "__ss_salt_r",
      leftSpec, rightSpec, keep = keep, rightOrderCol = rightOrderCol)
      .drop("__ss_salt", "__ss_salt_r")
  }
}
