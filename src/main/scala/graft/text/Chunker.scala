package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Overlapping character-window chunking — the retrieval-indexing
  * counterpart of [[Packing]]: each document splits into windows of
  * `size` chars advancing by `size − overlap`, so consecutive chunks
  * share `overlap` chars of context. The final window is the (possibly
  * shorter) tail; empty documents yield no chunks.
  *
  * Scale posture: a pure per-row explode of window start offsets
  * (`sequence` + codegen'd `substring`) — no shuffle, no state; chunk
  * counts are bounded by doc length / stride, and the operator runs
  * unchanged in Structured Streaming.
  */
object Chunker {

  /** One row per (input row, chunk): all input columns plus `chunk_id`
    * (0-based), `chunk_start` (0-based char offset), `chunk` (the text).
    */
  def chunk(df: DataFrame, textCol: String,
            size: Int, overlap: Int): DataFrame = {
    require(size > 0, "size must be positive")
    require(overlap >= 0 && overlap < size, "need 0 <= overlap < size")
    val stride = size - overlap
    // last window start: stride * floor((len - overlap - 1) / stride),
    // clamped at 0 — guarantees the tail past the previous window is
    // covered without emitting a window that adds no new chars
    val len = length(col(textCol))
    val lastStart = greatest(
      floor((len - overlap - 1).cast("double") / stride).cast("long") * stride,
      lit(0L))
    df.filter(len > 0)
      .withColumn("chunk_start",
        explode(sequence(lit(0L), lastStart, lit(stride.toLong))))
      .withColumn("chunk_id", (col("chunk_start") / stride).cast("long"))
      .withColumn("chunk",
        col(textCol).substr(col("chunk_start") + 1, lit(size)))
  }
}
