package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) layout: interleave the bits of several columns into
  * one sort key so that sorting by it co-locates rows that are close in
  * EVERY dimension — parquet row-group min/max bounds then tighten on
  * all of them at once, and range predicates on any participating
  * column skip row groups. The classic lake-layout answer to "we filter
  * by user AND by time": a single-column sort serves one predicate and
  * scatters the other; the z-curve serves both at ~equal fidelity.
  *
  * Everything is exact integer arithmetic on the DataFrame API:
  *   - each column is min/max-normalized to `bits` bits via one tiny
  *     global aggregate (ONE driver row — the only non-distributed
  *     step, two scans total: stats + write);
  *   - the z-value is a codegen'd shift-and-or expansion (no UDF, no
  *     loop at runtime — `bits × dims` OR terms, each a constant-shift
  *     of an AND);
  *   - the write is `repartitionByRange(z)` (range-partitioned files:
  *     file-level z-ranges are disjoint) + `sortWithinPartitions(z)`
  *     (row groups inside each file cover tight z-intervals).
  *
  * Normalization floors equal-width buckets via Long division by a
  * driver-computed bucket width — deterministic, engine-portable (the
  * oracle replays it bit-exactly), overflow-free for any Long span,
  * and monotone, which is all a sort key needs.
  */
object ZOrder {

  /** Interleaved z-value of pre-normalized codes (each in
    * `[0, 2^bits)`): bit i of column j lands at position
    * `i * dims + j`. Pure shift/and/or expansion — codegen'd.
    */
  def interleave(codes: Seq[Column], bits: Int): Column = {
    require(codes.nonEmpty, "need at least one column")
    require(bits > 0 && bits * codes.size <= 63,
      s"bits=$bits × ${codes.size} dims must fit in 63 bits")
    val dims = codes.size
    val terms = for {
      (c, j) <- codes.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * dims + j)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Append a z-value column computed from `cols` (numeric/timestamp),
    * min/max-normalized to `bits` bits each. Null values code to 0
    * (sort first — the usual null-cluster convention). Returns the
    * frame + the stats row used, so writers and oracles agree.
    */
  def withZValue(df: DataFrame, cols: Seq[String], bits: Int,
                 zCol: String = "z"): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    val longs = cols.map(c => col(c).cast("long"))
    val aggExprs = longs.zipWithIndex.flatMap { case (c, i) =>
      Seq(min(c).as(s"__mn$i"), max(c).as(s"__mx$i")) }
    val st = df.agg(aggExprs.head, aggExprs.tail: _*).head()
    val maxCode = (1L << bits) - 1
    val codes = longs.zipWithIndex.map { case (c, i) =>
      val mn = Option(st.get(st.fieldIndex(s"__mn$i")))
        .map(_.asInstanceOf[Long]).getOrElse(0L)
      val mx = Option(st.get(st.fieldIndex(s"__mx$i")))
        .map(_.asInstanceOf[Long]).getOrElse(0L)
      // a span that itself overflows Long (mx huge positive, mn huge
      // negative) cannot be bucketed exactly — fail loudly instead of
      // silently coding the dimension to a constant
      val span =
        try Math.subtractExact(mx, mn)
        catch {
          case _: ArithmeticException => throw new IllegalArgumentException(
            s"z-order column '${cols(i)}' span [$mn, $mx] overflows Long; " +
              "pre-scale the column (e.g. coarser time unit) first")
        }
      // equal-width buckets WITHOUT the (v-min)·maxCode product (which
      // overflows for wide spans like epoch-µs × 2^20): width is the
      // smallest bucket size that maps the span under 2^bits, and
      // (v-min) div width is INTEGRAL Long division (`div`, matching
      // DuckDB's `//` — plain `/` would be double division and lose
      // exactness past 2^53) — exact, monotone, portable, ≤ maxCode by
      // construction
      val width = span / (maxCode + 1) + 1
      if (span <= 0) lit(0L)
      else coalesce(call_function("div", c - lit(mn), lit(width)), lit(0L))
    }
    df.withColumn(zCol, interleave(codes, bits))
  }

  /** Z-ordered parquet write: range-partitioned on the z-value into
    * `numFiles` files, sorted by z within each. */
  def write(df: DataFrame, path: String, cols: Seq[String], bits: Int,
            numFiles: Int): Unit = {
    require(numFiles > 0, "numFiles > 0")
    withZValue(df, cols, bits)
      .repartitionByRange(numFiles, col("z"))
      .sortWithinPartitions(col("z"))
      .drop("z")
      .write.mode("overwrite").parquet(path)
  }
}
