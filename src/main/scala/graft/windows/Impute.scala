package graft.windows

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType, NumericType}

/** Grouped imputation — Spark-native reimplementation of the reference's
  * `impute` (`/root/reference/catabra_pandas/misc.py:699-845`).
  *
  * Methods (`misc.py:712-723`):
  *   - `ffill` / `bfill`: per-group forward/backward fill; `limit = k` fills
  *     at most `k` consecutive nulls after/before a valid value;
  *   - `afill`: average of ffill and bfill where both are defined, else
  *     whichever exists (`misc.py:744-758`);
  *   - `linear`: per-group linear interpolation **by row position** (row
  *     labels are ignored, `misc.py:721-722`), interior only (no
  *     extrapolation, `limit_area="inside"`); `limit = k` fills only the
  *     first `k` positions of each gap (pandas forward limit direction),
  *     with values computed as if the whole gap were interpolated;
  *   - `lfill`: `linear`, then `ffill`, then `bfill` (`misc.py:760-764`).
  *
  * The reference imputes "in the DataFrame's current order"; Spark frames
  * are unordered, so the order is an explicit `orderBy` parameter.
  * All passes share one shuffle + sort on (groupBy, orderBy) — the chained
  * window expressions reuse the same [[WindowSpec]] partitioning.
  *
  * `ffill`/`bfill`/`afill` work on any data type (afill midpoints require a
  * numeric or timestamp-like type supporting `+`/`-`/`/2` — enforced by the
  * analyzer); `linear`/`lfill` require numeric columns.
  *
  * Scale note: with `groupBy = Nil` every row may depend on a donor
  * arbitrarily far away in the global order, which a naive
  * `Window.partitionBy()` serves by moving the whole table through ONE
  * task. The keyless path here instead runs the [[graft.core.PrefixSum]]
  * two-phase shape: range-partition on the order, fill within each
  * partition in parallel, then fix up only the rows whose donor lives in
  * an earlier/later partition via a per-partition donor summary
  * (#shuffle-partitions rows — the only single-partition step, bounded
  * by config, not data). A differential spec pins keyless ≡ grouped with
  * a constant key for every method × limit.
  */
object Impute {

  private val Rn  = "__graft_rn"
  private val Pid = "__graft_pid"

  def apply(
      df: DataFrame,
      cols: Seq[String],
      method: String,
      groupBy: Seq[String],
      orderBy: Seq[Column],
      limit: Option[Int] = None): DataFrame = {
    require(cols.nonEmpty, "no columns to impute")
    require(Seq("ffill", "bfill", "afill", "linear", "lfill").contains(method),
      s"method=$method")
    limit.foreach(l => require(l > 0, "limit must be positive"))
    if (groupBy.nonEmpty) grouped(df, cols, method, groupBy, orderBy, limit)
    else keyless(df, cols, method, orderBy, limit)
  }

  // ---------------------------------------------------------------- grouped

  private def grouped(
      df: DataFrame,
      cols: Seq[String],
      method: String,
      groupBy: Seq[String],
      orderBy: Seq[Column],
      limit: Option[Int]): DataFrame = {
    val part = Window.partitionBy(groupBy.map(col): _*)
    val withRn = df.withColumn(Rn,
      row_number().over(part.orderBy(orderBy: _*)))
    val asc  = part.orderBy(col(Rn).asc).rowsBetween(Window.unboundedPreceding, 0)
    val desc = part.orderBy(col(Rn).desc).rowsBetween(Window.unboundedPreceding, 0)

    val imputed = method match {
      case "ffill"  => onePass(withRn, cols, asc, desc, limit, f = true, b = false)
      case "bfill"  => onePass(withRn, cols, asc, desc, limit, f = false, b = true)
      case "linear" => linearPass(withRn, cols, asc, desc, limit)
      case "afill"  =>
        // midpoint of ffill and bfill where both defined (misc.py:744-758)
        val exprs = cols.map { c =>
          val fv = fillExpr(col(c), asc, limit)
          val bv = fillExpr(col(c), desc, limit)
          when(fv.isNotNull && bv.isNotNull, fv + (bv - fv) / 2)
            .otherwise(coalesce(fv, bv)).as(c)
        }
        replace(withRn, cols, exprs)
      case "lfill"  =>
        val lin = linearPass(withRn, cols, asc, desc, limit)
        val ff  = onePass(lin, cols, asc, desc, limit, f = true, b = false)
        onePass(ff, cols, asc, desc, limit, f = false, b = true)
    }
    imputed.drop(Rn)
  }

  /** Forward- or backward-fill value of `c` under frame `w` (running frame
    * in fill direction), honoring `limit`: a row more than `limit` rows
    * from the donating valid value stays null.
    */
  private def fillExpr(c: Column, w: WindowSpec, limit: Option[Int]): Column = {
    val filled = last(c, ignoreNulls = true).over(w)
    limit match {
      case None => filled
      case Some(k) =>
        // the donor's row number via the SAME last(ignoreNulls) frame that
        // picks the donor value — max(rn) would find the farthest donor
        // under the descending (bfill) frame, not the nearest
        val donorRn = last(when(c.isNotNull, col(Rn)), ignoreNulls = true).over(w)
        val dist    = abs(col(Rn) - donorRn)
        when(c.isNotNull, c).when(dist <= k, filled).otherwise(lit(null))
    }
  }

  private def onePass(
      df: DataFrame, cols: Seq[String],
      asc: WindowSpec, desc: WindowSpec,
      limit: Option[Int], f: Boolean, b: Boolean): DataFrame = {
    val exprs = cols.map { c =>
      (if (f) fillExpr(col(c), asc, limit) else fillExpr(col(c), desc, limit)).as(c)
    }
    replace(df, cols, exprs)
  }

  /** Interior-only positional linear interpolation; with `limit = k` only
    * the first `k` rows of each null gap are filled (pandas forward limit).
    */
  private def linearPass(
      df: DataFrame, cols: Seq[String],
      asc: WindowSpec, desc: WindowSpec,
      limit: Option[Int]): DataFrame = {
    cols.foreach { c =>
      require(df.schema(c).dataType.isInstanceOf[NumericType],
        s"linear interpolation requires a numeric column, got $c")
    }
    val exprs = cols.map { cn =>
      val c = col(cn)
      val pv  = last(c, ignoreNulls = true).over(asc)
      val pRn = max(when(c.isNotNull, col(Rn))).over(asc)
      val nv  = last(c, ignoreNulls = true).over(desc)
      val nRn = min(when(c.isNotNull, col(Rn))).over(desc)
      linearExpr(c, df.schema(cn).dataType, pv, pRn, nv, nRn, limit).as(cn)
    }
    replace(df, cols, exprs)
  }

  /** Shared linear-interpolation combine: prev/next donor (value, rn) →
    * imputed value; interior-only, pandas forward `limit`.
    */
  private def linearExpr(
      c: Column, dt: org.apache.spark.sql.types.DataType,
      pv: Column, pRn: Column, nv: Column, nRn: Column,
      limit: Option[Int]): Column = {
    val frac = (col(Rn) - pRn).cast(DoubleType) / (nRn - pRn).cast(DoubleType)
    val interp = (pv + (nv - pv) * frac).cast(dt match {
      case FloatType => FloatType
      case _         => DoubleType
    })
    val base = when(c.isNotNull, c)
      .when(pv.isNull || nv.isNull, lit(null))
    limit match {
      case None    => base.otherwise(interp)
      case Some(k) => base.when(col(Rn) - pRn <= k, interp).otherwise(lit(null))
    }
  }

  // ---------------------------------------------------------------- keyless

  private def fvc(c: String) = s"__graft_fv_$c"
  private def fdc(c: String) = s"__graft_fd_$c"
  private def bvc(c: String) = s"__graft_bv_$c"
  private def bdc(c: String) = s"__graft_bd_$c"

  /** Global-order imputation without moving the table through one task:
    * range-partition on `orderBy`, number rows globally via per-partition
    * counts, then each pass = parallel within-partition fill + a carry
    * join against a per-partition donor summary.
    */
  private def keyless(
      df: DataFrame,
      cols: Seq[String],
      method: String,
      orderBy: Seq[Column],
      limit: Option[Int]): DataFrame = {
    val cnt = "__graft_cnt"; val off = "__graft_off"
    val parts = df.repartitionByRange(orderBy: _*)
      .withColumn(Pid, spark_partition_id())
    val wLoc = Window.partitionBy(col(Pid)).orderBy(orderBy: _*)
    val local = parts.withColumn(Rn, row_number().over(wLoc).cast("long"))
    // #partitions rows — single-partition window bounded by config
    val wOff = Window.orderBy(col(Pid)).rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy(col(Pid)).agg(count(lit(1)).as(cnt))
      .withColumn(off, coalesce(sum(col(cnt)).over(wOff), lit(0L)))
      .drop(cnt)
    val withRn = local.join(broadcast(offsets), Seq(Pid))
      .withColumn(Rn, col(Rn) + col(off)).drop(off)

    val imputed = method match {
      case "ffill" => directional(withRn, cols, forward = true, limit)
      case "bfill" => directional(withRn, cols, forward = false, limit)
      case "afill" =>
        val both = dirFill(dirFill(withRn, cols, forward = true), cols, forward = false)
        val exprs = cols.map { c =>
          val f = limited(col(c), col(fvc(c)), col(fdc(c)), limit)
          val b = limited(col(c), col(bvc(c)), col(bdc(c)), limit)
          when(f.isNotNull && b.isNotNull, f + (b - f) / 2)
            .otherwise(coalesce(f, b)).as(c)
        }
        dropTmp(replace(both, cols, exprs), cols)
      case "linear" => linearKeyless(withRn, cols, limit)
      case "lfill" =>
        val lin = linearKeyless(withRn, cols, limit)
        val ff  = directional(lin, cols, forward = true, limit)
        directional(ff, cols, forward = false, limit)
    }
    imputed.drop(Rn, Pid)
  }

  /** Adds, per column `c`, the nearest in-fill-direction donor value
    * (`fv`/`bv`) and its global row number (`fd`/`bd`). Within-partition
    * donors come from a pid-partitioned window (parallel); rows before
    * their partition's first donor are fixed up from a broadcast
    * per-partition carry summary (the donor each partition exports,
    * prefix-scanned over ≤ #shuffle-partitions rows).
    */
  private def dirFill(df: DataFrame, cols: Seq[String], forward: Boolean): DataFrame = {
    val vc: String => String = if (forward) fvc else bvc
    val dc: String => String = if (forward) fdc else bdc
    val ord = if (forward) col(Rn).asc else col(Rn).desc
    val w = Window.partitionBy(col(Pid)).orderBy(ord)
      .rowsBetween(Window.unboundedPreceding, 0)
    val withLocal = df.select(df.columns.map(col).toIndexedSeq ++ cols.flatMap { c =>
      Seq(last(col(c), ignoreNulls = true).over(w).as(vc(c)),
          last(when(col(c).isNotNull, col(Rn)), ignoreNulls = true).over(w).as(dc(c)))
    }: _*)
    val outC = (c: String) => s"__graft_out_$c"
    val inC  = (c: String) => s"__graft_in_$c"
    // the donor each partition exports in fill direction: its last
    // (forward) / first (backward) non-null row — max_by/min_by skip
    // rows whose ordering key is null, i.e. null values never donate
    val aggs = cols.map { c =>
      val ordV  = when(col(c).isNotNull, col(Rn))
      val donor = struct(col(Rn).as("dn"), col(c).as("v"))
      (if (forward) max_by(donor, ordV) else min_by(donor, ordV)).as(outC(c))
    }
    val summary = df.groupBy(col(Pid)).agg(aggs.head, aggs.tail: _*)
    val wCarry = Window.orderBy(if (forward) col(Pid).asc else col(Pid).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = cols.foldLeft(summary) { (d, c) =>
      d.withColumn(inC(c), last(col(outC(c)), ignoreNulls = true).over(wCarry))
    }.select((col(Pid) +: cols.map(c => col(inC(c)))).toIndexedSeq: _*)
    val joined = withLocal.join(broadcast(carry), Seq(Pid))
    val fixed = cols.foldLeft(joined) { (d, c) =>
      d.withColumn(vc(c), coalesce(col(vc(c)), col(inC(c)).getField("v")))
       .withColumn(dc(c), coalesce(col(dc(c)), col(inC(c)).getField("dn")))
    }
    fixed.drop(cols.map(inC): _*)
  }

  /** Fill value under `limit` given a donor (value, global rn): a donor
    * farther than `limit` rows stays null — mirrors [[fillExpr]].
    */
  private def limited(c: Column, v: Column, dn: Column, limit: Option[Int]): Column =
    limit match {
      case None    => v
      case Some(k) =>
        when(c.isNotNull, c).when(abs(col(Rn) - dn) <= k, v).otherwise(lit(null))
    }

  private def directional(
      df: DataFrame, cols: Seq[String],
      forward: Boolean, limit: Option[Int]): DataFrame = {
    val filled = dirFill(df, cols, forward)
    val (vc, dc) = if (forward) (fvc _, fdc _) else (bvc _, bdc _)
    val exprs = cols.map(c => limited(col(c), col(vc(c)), col(dc(c)), limit).as(c))
    dropTmp(replace(filled, cols, exprs), cols)
  }

  private def linearKeyless(
      df: DataFrame, cols: Seq[String], limit: Option[Int]): DataFrame = {
    cols.foreach { c =>
      require(df.schema(c).dataType.isInstanceOf[NumericType],
        s"linear interpolation requires a numeric column, got $c")
    }
    val both = dirFill(dirFill(df, cols, forward = true), cols, forward = false)
    val exprs = cols.map { cn =>
      linearExpr(col(cn), df.schema(cn).dataType,
        col(fvc(cn)), col(fdc(cn)), col(bvc(cn)), col(bdc(cn)), limit).as(cn)
    }
    dropTmp(replace(both, cols, exprs), cols)
  }

  private def dropTmp(df: DataFrame, cols: Seq[String]): DataFrame =
    df.drop(cols.flatMap(c => Seq(fvc(c), bvc(c), fdc(c), bdc(c))): _*)

  /** Swap columns `cols` for `exprs` keeping all other columns + order. */
  private def replace(df: DataFrame, cols: Seq[String], exprs: Seq[Column]): DataFrame = {
    val m = cols.zip(exprs).toMap
    df.select(df.columns.map(c => m.getOrElse(c, col(c)).as(c)).toIndexedSeq: _*)
  }
}
