package graft.resample

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Custom-aggregation surface for [[ResampleEav]] — the Spark-native
  * counterpart of the reference's callable agg hook
  * (`/root/reference/catabra_pandas/resampling.py:94-96`, exec
  * `resampling.py:1875-1884`).
  *
  * The reference takes a pandas callable and probes its output schema with
  * a dummy invocation (`resampling.py:257-273`); Spark needs declared
  * schemas, so the hook is a function `(value, time) => Column` returning
  * any aggregate expression — built-ins, SQL, or an
  * [[org.apache.spark.sql.expressions.Aggregator]] registered via
  * [[org.apache.spark.sql.functions.udaf]]. Statelessness
  * (`resampling.py:130-140`) is inherent: expressions are pure.
  *
  * Example with a typed Aggregator (exact second moment):
  * {{{
  * val m2 = udaf(CustomAgg.SumOfSquares)
  * ResampleEav(obs, windows,
  *   agg = Map("hr" -> Seq("mean")),
  *   customAgg = Map("hr" -> Seq("m2" -> ((v, t) => m2(v)))), ...)
  * }}}
  */
object CustomAgg {

  /** A custom per-window aggregation: output name + expression builder
    * over the (value, time) columns of the observations in the window.
    */
  type Spec = (String, (Column, Column) => Column)

  /** Example typed Aggregator: Σ v² over non-null values — demonstrates
    * plugging an `Aggregator[IN, BUF, OUT]` into the hook via `udaf`.
    */
  object SumOfSquares extends Aggregator[java.lang.Double, Double, Double] {
    def zero: Double = 0.0
    def reduce(b: Double, a: java.lang.Double): Double =
      if (a == null) b else b + a * a
    def merge(b1: Double, b2: Double): Double = b1 + b2
    def finish(r: Double): Double = r
    def bufferEncoder: Encoder[Double] = Encoders.scalaDouble
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Example: time of the maximum value (argmax) as a single expression. */
  def timeOfMax: (Column, Column) => Column = (v, t) => {
    import org.apache.spark.sql.functions._
    max_by(t, v)
  }
}
