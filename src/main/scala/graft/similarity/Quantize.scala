package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, ByteType, DoubleType}

/** Symmetric per-vector int8 quantization for embedding columns — the
  * standard storage/bandwidth lever for corpus-scale vector data (4 B
  * float → 1 B int8 + one scale per vector; cosine is scale-invariant,
  * so ranking survives quantization up to rounding error).
  *
  * `scale = max|x| / 127` (0 for all-zero vectors);
  * `q_i = clamp(round(x_i / scale), −127, 127)` stored as `tinyint`.
  * Reconstruction error is ≤ scale/2 per component by construction.
  *
  * Scale posture: pure per-row projections (no shuffle, no state —
  * streams unchanged); the arithmetic is plain double ops + round, so
  * the quantized codes are bit-reproducible across engines (round ties
  * go away from zero in both Spark and DuckDB — oracle-checked).
  */
object Quantize {

  /** max|x| of an array column, as double. */
  private def maxAbs(vec: Column): Column =
    coalesce(array_max(transform(vec, x => abs(x.cast("double")))), lit(0.0))

  /** Adds `scaleCol` (double) and `qCol` (array<tinyint>) next to
    * `vecCol`. Null vectors pass through as null q/scale.
    *
    * One generated pass per row (codegen'd
    * [[org.apache.spark.sql.graft.VecQuant8]]). The declarative HOF
    * formulation ([[int8Hof]], kept for the differential spec) is O(d²)
    * per row once `CollapseProject` inlines the scale sub-plan into the
    * per-element lambda — ~1 ms/row at d = 64, the entire cost of the
    * quantization bench queries.
    */
  def int8(df: DataFrame, vecCol: String,
           qCol: String = "q8", scaleCol: String = "scale"): DataFrame = {
    val f = org.apache.spark.sql.graft.VecFunctions
    df.withColumn("__graft_qz",
        f.vec_quant_i8(col(vecCol).cast(ArrayType(DoubleType))))
      .withColumn(scaleCol, col("__graft_qz.scale"))
      .withColumn(qCol, col("__graft_qz.q8"))
      .drop("__graft_qz")
  }

  /** The declarative HOF formulation of [[int8]] — kept as the
    * differential-spec reference for the codegen path. The explicit
    * `x.isNull` branch is load-bearing: without it
    * `greatest(null, lit(-127))` SKIPS the null and silently turns a
    * missing component into the extreme code −127 (the same
    * `greatest`/`least` null-skipping footgun the Winsorize clip fix
    * documents). Null elements quantize to null codes on both paths.
    */
  private[graft] def int8Hof(df: DataFrame, vecCol: String,
           qCol: String = "q8", scaleCol: String = "scale"): DataFrame = {
    val staged = df.withColumn(scaleCol,
      when(col(vecCol).isNull, lit(null))
        .otherwise(maxAbs(col(vecCol)) / 127))
    staged.withColumn(qCol,
      when(col(vecCol).isNull, lit(null))
        .otherwise(transform(col(vecCol), x =>
          when(x.isNull, lit(null))
            .when(col(scaleCol) === 0, lit(0))
            .otherwise(least(greatest(
              round(x.cast("double") / col(scaleCol)), lit(-127)), lit(127)))
            .cast("int")))
        .cast(ArrayType(ByteType)))
  }

  /** Reconstruct approximate floats: `q_i · scale`. */
  def dequantize(q: Column, scale: Column): Column =
    transform(q, x => x.cast("double") * scale)

  /** Cosine between two quantized vectors (scale cancels — exact cosine
    * of the reconstructed vectors). Dot and sum-of-squares are EXACT
    * longs via the codegen'd int8 expressions, and IEEE sqrt/divide are
    * exactly rounded, so quantized cosine is bit-reproducible across
    * engines — no float-summation-order noise at all.
    */
  def cosine8(qa: Column, qb: Column): Column = {
    val f = org.apache.spark.sql.graft.VecFunctions
    val d = f.vec_dot_i8(qa, qb)
    val na = f.vec_sumsq_i8(qa)
    val nb = f.vec_sumsq_i8(qb)
    when(na === 0 || nb === 0, lit(0.0))
      .otherwise(d.cast("double") /
        (sqrt(na.cast("double")) * sqrt(nb.cast("double"))))
  }

  /** Brute-force top-k over int8-quantized vectors — [[CosineTopK]] on
    * codes: queries broadcast, corpus streams, per-query top-k via the
    * rank window ([[org.apache.spark.sql.execution.window.WindowGroupLimit]]
    * prunes it map-side). 4× less corpus I/O than the float path and an
    * integer inner loop.
    */
  def topK(corpus: DataFrame, queries: DataFrame, idCol: String,
           qCol: String, k: Int, excludeSelf: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // null codes never rank: a null cosine would still WIN window slots
    // (row_number assigns ranks to null-scored rows too)
    val q = queries.filter(col(qCol).isNotNull)
      .select(col(idCol).as("query_id"), col(qCol).as("__graft_qq"))
    val c = corpus.filter(col(qCol).isNotNull)
      .select(col(idCol).as("neighbor_id"), col(qCol).as("__graft_cq"))
    val scored = c.crossJoin(broadcast(q))
      .filter(if (excludeSelf) col("neighbor_id") =!= col("query_id") else lit(true))
      .withColumn("cosine", cosine8(col("__graft_qq"), col("__graft_cq")))
    scored
      .withColumn("rank", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(col("cosine").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }
}
