package graft.windows

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-column request for [[PrevNextValues]]: which output columns to emit
  * and what to fill at group edges (mirrors the `columns` dict of the
  * reference's `prev_next_values`, `/root/reference/catabra_pandas/misc.py:465-480`).
  */
final case class PrevNextSpec(
    prevName: Option[String] = None,
    nextName: Option[String] = None,
    prevFill: Option[Column] = None,
    nextFill: Option[Column] = None)

/** Grouped lag/lead — reimplementation of the reference's `prev_next_values`
  * (`/root/reference/catabra_pandas/misc.py:439-641`).
  *
  * Per group (`groupBy`), sorted by `sortBy` (NA values sort last, matching
  * `DataFrame.sort_values`, `misc.py:458-460`): previous/next values of the
  * requested columns with per-column fill values for group edges, plus
  * optional is-first / is-last indicators.
  *
  * One `Window.partitionBy(groupBy).orderBy(sortBy)` serves every requested
  * column — a single shuffle + sort regardless of how many columns are asked
  * for. Row order of the result is not defined (Spark DataFrames are
  * unordered); the reference's `keep_sorted`/`inplace` variants are order
  * bookkeeping with no Spark counterpart.
  */
object PrevNextValues {

  def apply(
      df: DataFrame,
      sortBy: Seq[String],
      groupBy: Seq[String] = Nil,
      columns: Map[String, PrevNextSpec] = Map.empty,
      firstIndicatorName: Option[String] = None,
      lastIndicatorName: Option[String] = None): DataFrame = {

    require(sortBy.nonEmpty, "sortBy must be non-empty")
    require(sortBy.intersect(groupBy).isEmpty,
      "sortBy and groupBy must be disjoint")

    val ord  = sortBy.map(c => col(c).asc_nulls_last)
    val w    = Window.partitionBy(groupBy.map(col): _*).orderBy(ord: _*)
    val wDesc = Window.partitionBy(groupBy.map(col): _*)
      .orderBy(sortBy.map(c => col(c).desc_nulls_first): _*)

    val withCols = columns.filter { case (c, _) => df.columns.contains(c) }
      .foldLeft(df) { case (acc, (c, spec)) =>
        val acc1 = spec.prevName.fold(acc) { n =>
          val lagged = lag(col(c), 1).over(w)
          acc.withColumn(n, spec.prevFill.fold(lagged)(f =>
            when(row_number().over(w) === 1, f).otherwise(lagged)))
        }
        spec.nextName.fold(acc1) { n =>
          val led = lead(col(c), 1).over(w)
          acc1.withColumn(n, spec.nextFill.fold(led)(f =>
            when(row_number().over(wDesc) === 1, f).otherwise(led)))
        }
      }

    val withFirst = firstIndicatorName.fold(withCols)(n =>
      withCols.withColumn(n, row_number().over(w) === 1))
    lastIndicatorName.fold(withFirst)(n =>
      withFirst.withColumn(n, row_number().over(wDesc) === 1))
  }
}
