package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Opaque multimodal payload row: media as `binary` + typed metadata.
  * The content column is never interpreted by the engine — only by the
  * batched decode stages, which is what keeps the schema stable across
  * image/audio/video.
  */
final case class MediaRow(
    media_id: Long,
    kind: String,            // "image" | "audio" | "video"
    content: Array[Byte],
    width: Int,              // 0 when not applicable
    height: Int,
    sample_rate: Int,
    n_frames: Int)

final case class MediaFeatures(
    media_id: Long,
    kind: String,
    n_bytes: Int,
    features: Array[Float])

/** Multimodal column plumbing — batch decode / feature-extract / resize /
  * frame-sample over `binary` media columns.
  *
  * Execution model: the Scala-native analog of PySpark's `mapInPandas` is
  * `Dataset.mapPartitions` — each partition is processed as an iterator,
  * and the decode stages batch rows (`BatchSize`) so a real decoder
  * (libjpeg/ffmpeg JNI, a model runtime) amortizes per-call overhead
  * exactly like an Arrow batch would. Partitioning, schema and batch
  * shape are real and tested; ONLY the innermost byte→pixel decode is a
  * STUB (this container has no image/audio codecs) — a deterministic
  * fake keyed on the payload bytes, clearly marked below.
  */
object Media {

  /** Rows per decode batch — the Arrow-batch-size analog. */
  val BatchSize = 64

  /** ── STUB ──  Deterministic fake decoder standing in for a real codec
    * (libjpeg / PCM / ffmpeg). Maps bytes → `dim` floats in [0,1) so
    * results are stable across partitionings and retries (a must for
    * exactly-once semantics at scale). Feature j = the first 24 bits of
    * `md5(content ++ ":" ++ j)` scaled to [0,1) — md5 is bit-identical in
    * every engine, so a SQL differential oracle can reproduce the values
    * (`('0x' || substring(md5(text || ':j'), 1, 6))::BIGINT / 2^24`).
    * Replace the body with the real codec; every signature stays the same.
    */
  private[multimodal] def decodeStub(content: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var j = 0
    while (j < dim) {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.update(content)
      md.update(s":$j".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val h = md.digest()
      val v = ((h(0) & 0xffL) << 16) | ((h(1) & 0xffL) << 8) | (h(2) & 0xffL)
      out(j) = (v.toDouble / (1 << 24).toDouble).toFloat
      j += 1
    }
    out
  }

  /** Decode + feature-extract: batched `mapPartitions`; one feature vector
    * of `dim` floats per media row.
    */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 16): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        // real decoders process `batch` as one call; the stub is per-row
        batch.map { m =>
          MediaFeatures(m.media_id, m.kind, m.content.length,
            decodeStub(m.content, dim))
        }
      }
    }
  }

  /** "Resize": stride-downsample a decoded feature/pixel vector to
    * `targetDim` (the real implementation would be area-interpolating on
    * the decoded pixel grid; the plumbing — column shapes, nullability,
    * codegen-able post-processing — is identical).
    */
  def resize(features: DataFrame, featCol: String, targetDim: Int): DataFrame = {
    val f = col(featCol)
    val n = size(f)
    features.withColumn(featCol,
      transform(sequence(lit(0), lit(targetDim - 1)),
        i => element_at(f, ((i * n / targetDim) + 1).cast("int"))))
  }

  /** Frame sampling for video-kind rows: every `stride`-th frame index up
    * to `n_frames`, exploded to one row per sampled frame. Non-video rows
    * pass through with frame_idx = 0.
    */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame = {
    media.withColumn("frame_idx",
      explode(when(col("kind") === "video" && col("n_frames") > 0,
          sequence(lit(0), col("n_frames") - 1, lit(stride)))
        .otherwise(array(lit(0)))))
  }

  /** Build a synthetic media table from the documents table (text bytes as
    * payload) — the testdata has no real binary column; this exercises the
    * full pipeline shape deterministically.
    */
  def fromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      // deterministic kind mix: image/audio/video by id mod 3
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("content"),
      lit(32).as("width"), lit(32).as("height"),
      lit(16000).as("sample_rate"),
      (col("n_chars") % 30 + 1).cast("int").as("n_frames"))
      .as[MediaRow]
  }
}
