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
  * Scale note: with `groupBy = Nil` the fill is a single global ordered
  * scan (`Window.partitionBy()` — one partition, inherent to the
  * semantics: every row may depend on a donor arbitrarily far away).
  * That is fine for a per-series frame but not for a 100 TB table —
  * grouped imputation (per entity/series) is the scale path, which is
  * also the only form the reference exercises.
  */
object Impute {

  private val Rn = "__graft_rn"

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

    val part =
      if (groupBy.nonEmpty) Window.partitionBy(groupBy.map(col): _*)
      else Window.partitionBy()
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
      val frac = (col(Rn) - pRn).cast(DoubleType) / (nRn - pRn).cast(DoubleType)
      val interp = (pv + (nv - pv) * frac).cast(df.schema(cn).dataType match {
        case FloatType => FloatType
        case _         => DoubleType
      })
      val base = when(c.isNotNull, c)
        .when(pv.isNull || nv.isNull, lit(null))
      (limit match {
        case None    => base.otherwise(interp)
        case Some(k) => base.when(col(Rn) - pRn <= k, interp).otherwise(lit(null))
      }).as(cn)
    }
    replace(df, cols, exprs)
  }

  /** Swap columns `cols` for `exprs` keeping all other columns + order. */
  private def replace(df: DataFrame, cols: Seq[String], exprs: Seq[Column]): DataFrame = {
    val m = cols.zip(exprs).toMap
    df.select(df.columns.map(c => m.getOrElse(c, col(c)).as(c)).toIndexedSeq: _*)
  }
}
