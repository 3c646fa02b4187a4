package graft.similarity

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss random projection: reduce an embedding column
  * from `dimIn` to `dimOut` dimensions with a deterministic ±1 sign
  * matrix (Achlioptas, JCSS'03: Rademacher entries satisfy the JL lemma
  * with the same guarantees as Gaussians; scaling by 1/√dimOut makes
  * the projection distance-preserving in expectation).
  *
  * This is the pre-ANN scale path the reference (a pandas library with
  * no vector ops) has nothing like: brute-force cosine is O(|Q|·|C|·d),
  * so halving or quartering d before [[CosineTopK]] / [[IvfAnn]] /
  * [[SemDedup]] cuts the dominant term proportionally, at a recall cost
  * bounded by JL. At 100 TB the projection is a stateless per-row
  * map — no shuffle, streams unchanged — and the matrix is dimIn×dimOut
  * literals compiled into the plan (never a driver-side collect or a
  * side file).
  *
  * Determinism: entry (i, j) is the parity of the first hex digit of
  * `md5("<seed>:<i>:<j>")` → +1/−1. No RNG state, no partition-order
  * dependence; any engine (the DuckDB oracle included) reproduces the
  * matrix from the same recipe.
  */
object RandomProjection {

  /** Sign at (row i = input dim, col j = output dim): +1 if the first
    * hex digit of md5("seed:i:j") is even, else −1. DuckDB spelling:
    * `CASE WHEN ('0x' || substring(md5(seed || ':' || i || ':' || j), 1, 1))::INT % 2 = 0
    *       THEN 1.0 ELSE -1.0 END`.
    */
  def signAt(seed: Long, i: Int, j: Int): Double = {
    val d = MessageDigest.getInstance("MD5")
      .digest(s"$seed:$i:$j".getBytes(StandardCharsets.UTF_8))
    // first hex digit = high nibble of byte 0
    if (((d(0) >> 4) & 0x1) == 0) 1.0 else -1.0
  }

  /** The dimIn×dimOut matrix, one Array per OUTPUT dim (inner index =
    * input dim) — the shape [[project]] feeds to the codegen'd dot.
    */
  def matrix(dimIn: Int, dimOut: Int, seed: Long): Array[Array[Double]] =
    Array.tabulate(dimOut)(j => Array.tabulate(dimIn)(i => signAt(seed, i, j)))

  /** Projected column: `array<double>` of length dimOut where
    * out[j] = Σ_i vec[i]·sign(i,j) / √dimOut — ONE native
    * [[org.apache.spark.sql.graft.VecProject]] pass (the earlier
    * composed form inlined dimOut dot loops into the projection's
    * generated method — the round-9 generated-code-size rule,
    * SCALING.md; `SketchSpecs` pins the projection values).
    */
  def projectCol(vec: Column, dimIn: Int, dimOut: Int,
                 seed: Long = 42L): Column = {
    require(dimOut >= 1 && dimIn >= 1, s"bad shape $dimIn -> $dimOut")
    val m = matrix(dimIn, dimOut, seed)
    org.apache.spark.sql.graft.VecFunctions.vec_project(
      vec, m.map(_.toIndexedSeq).toIndexedSeq, math.sqrt(dimOut.toDouble))
  }

  /** Frame form: `vecCol` replaced by its dimOut-dim projection (input
    * casts from the source `array<float>` on the fly).
    */
  def project(df: DataFrame, vecCol: String, dimIn: Int, dimOut: Int,
              seed: Long = 42L): DataFrame =
    df.withColumn(vecCol,
      when(col(vecCol).isNull, lit(null))
        .otherwise(projectCol(col(vecCol).cast("array<double>"),
          dimIn, dimOut, seed)))
}
