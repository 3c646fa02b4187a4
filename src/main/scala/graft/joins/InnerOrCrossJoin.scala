package graft.joins

import org.apache.spark.sql.DataFrame

/** `inner_or_cross_join` — Spark-native counterpart of the reference's
  * helper (`/root/reference/catabra_pandas/misc.py:939-978`): inner-join
  * `left` to `right` on the given key columns when keys are provided,
  * otherwise replicate every `left` row for every `right` row (cross
  * join). Catalyst picks broadcast/shuffled strategies; cross joins
  * broadcast the smaller side automatically under AQE.
  */
object InnerOrCrossJoin {

  def apply(left: DataFrame, right: DataFrame, on: Seq[String] = Nil): DataFrame =
    if (on.nonEmpty) left.join(right, on) else left.crossJoin(right)
}
