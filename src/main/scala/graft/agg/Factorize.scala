package graft.agg

import graft.core.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Joint dense-integer row encoding — reimplementation of the reference's
  * `factorize` (`/root/reference/catabra_pandas/misc.py:1119-1318`).
  *
  * Equal rows (over `cols`) receive equal codes; codes are dense `0..n-1`.
  * `sort = true` orders keys lexicographically (nulls last, matching
  * NumPy's argsort placing NaN last); `sort = false` orders keys by first
  * appearance. Nulls are distinct, matchable factors (`misc.py:1166`).
  *
  * Plan: `distinct()` on the key columns (map-side combine shrinks this to
  * key cardinality), a distributed `orderBy` + dense partition-offset
  * numbering ([[graft.core.Tables.withRowId]] — per-partition counts
  * rolled into running offsets, no single-partition window and no RDD
  * round-trip), then a broadcast-friendly join back. The two-frame
  * variant unions both key sets so equal rows across frames share codes
  * (`misc.py:1230-1260`).
  */
object Factorize {

  /** df + `codeCol`. */
  def apply(
      df: DataFrame,
      cols: Seq[String],
      sort: Boolean = true,
      codeCol: String = "code"): DataFrame =
    attach(df, cols, codes(Seq(df), cols, sort), codeCol)

  /** `return_count` form (`misc.py:1140-1143`): the coded frame plus the
    * number of distinct keys (= the code-table size; one count job over
    * the already-built distinct frame).
    */
  def withCount(
      df: DataFrame,
      cols: Seq[String],
      sort: Boolean = true,
      codeCol: String = "code"): (DataFrame, Long) = {
    val keyCodes = codes(Seq(df), cols, sort)
    (attach(df, cols, keyCodes, codeCol), keyCodes.count())
  }

  /** Joint factorization of two frames over parallel column lists:
    * returns both frames with a shared code space.
    */
  def joint(
      df1: DataFrame, cols1: Seq[String],
      df2: DataFrame, cols2: Seq[String],
      sort: Boolean = true,
      codeCol: String = "code"): (DataFrame, DataFrame) = {
    val canonical = cols1
    val n2 = df2.select(cols2.zip(canonical).map { case (c, a) => col(c).as(a) }: _*)
    val keyCodes = codes(Seq(df1.select(canonical.map(col): _*), n2), canonical, sort)
    (attach(df1, cols1, keyCodes, codeCol),
     attach(df2, cols2, keyCodes.toDF(cols2 :+ "__graft_code": _*), codeCol))
  }

  /** Distinct keys (canonical column names) + dense `__graft_code`. */
  private def codes(frames: Seq[DataFrame], cols: Seq[String], sort: Boolean): DataFrame = {
    val keyed =
      if (sort) {
        frames.map(_.select(cols.map(col): _*)).reduce(_ unionByName _)
          .distinct()
          .orderBy(cols.map(c => col(c).asc_nulls_last): _*)
      } else {
        // first appearance across the concatenation of all frames, in
        // order. Ordered by the PAIR (frame index, monotonic id) — packing
        // both into one long would collide once the partition id reaches
        // bit 40 (monotonically_increasing_id uses partitionId << 33), so
        // a struct keeps frame-major order at any partition count
        frames.map(_.select(cols.map(col): _*))
          .zipWithIndex
          .map { case (f, i) =>
            f.withColumn("__graft_ord",
              struct(lit(i).as("f"), monotonically_increasing_id().as("m")))
          }
          .reduce(_ unionByName _)
          .groupBy(cols.map(col): _*)
          .agg(min(col("__graft_ord")).as("__graft_ord"))
          .orderBy(col("__graft_ord"))
          .drop("__graft_ord")
      }
    // dense numbering in partition-major (= sorted) order, inside Tungsten
    Tables.withRowId(keyed, "__graft_code")
  }

  private def attach(
      df: DataFrame, cols: Seq[String], keyCodes: DataFrame, codeCol: String): DataFrame = {
    val prefixed = keyCodes.columns.foldLeft(keyCodes)((d, c) =>
      if (c == "__graft_code") d else d.withColumnRenamed(c, "__graft_k_" + c))
    val cond = cols.zip(keyCodes.columns.filter(_ != "__graft_code"))
      .map { case (c, k) => col(c) <=> col("__graft_k_" + k) }
      .reduce(_ && _)
    // no explicit broadcast: the code table is key-cardinality-sized —
    // usually tiny (AQE broadcasts it at runtime), but a forced broadcast
    // would OOM on high-cardinality keys
    df.join(prefixed, cond, "left")
      .drop(prefixed.columns.filter(_ != "__graft_code"): _*)
      .withColumnRenamed("__graft_code", codeCol)
  }
}
