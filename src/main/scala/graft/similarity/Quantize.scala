package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, ByteType}

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
    */
  def int8(df: DataFrame, vecCol: String,
           qCol: String = "q8", scaleCol: String = "scale"): DataFrame = {
    val staged = df.withColumn(scaleCol, maxAbs(col(vecCol)) / 127)
    staged.withColumn(qCol,
      when(col(vecCol).isNull, lit(null))
        .otherwise(transform(col(vecCol), x =>
          when(col(scaleCol) === 0, lit(0))
            .otherwise(least(greatest(
              round(x.cast("double") / col(scaleCol)), lit(-127)), lit(127)))
            .cast("int")))
        .cast(ArrayType(ByteType)))
  }

  /** Reconstruct approximate floats: `q_i · scale`. */
  def dequantize(q: Column, scale: Column): Column =
    transform(q, x => x.cast("double") * scale)

  /** Cosine between two quantized vectors (scale cancels — exact cosine
    * of the reconstructed vectors). */
  def cosine8(qa: Column, qb: Column): Column =
    VectorOps.cosine(
      transform(qa, _.cast("double")), transform(qb, _.cast("double")))
}
