package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.dedup.{Buckets, SimHashDedup}

/** Perceptual AUDIO near-duplicate detection — the third member of the
  * perceptual media family (images: [[Media.aHash64]]/[[Media.pHash64]],
  * video: [[VideoDedup]]): each audio-kind payload is decoded to PCM
  * and fingerprinted by [[Media.audioFingerprint]] (63-bit |amplitude|
  * envelope band-sign hash — exact Long arithmetic end to end, so a
  * SQL differential oracle replays it bit-for-bit), then fingerprints
  * within `maxHamming` bits pair through the pigeonhole machinery of
  * [[graft.dedup.SimHashDedup.fromFingerprints]] — exact recall by
  * pigeonhole, count-first bounded blocks (a boilerplate jingle shared
  * by > `maxBucket` clips is refused whole and auditable via
  * [[droppedBlocks]], never a task-killing bucket).
  *
  * What the fingerprint is robust to (by construction, probed by
  * [[graft.AudioHashProbe]] on the gain-replica fixture): uniform
  * amplitude gain (a positive scaling of every bin mean scales every
  * DCT coefficient positively — measured planted distance ≤ 1 across
  * ±25% gains), DC offset, and re-sampling that preserves the envelope
  * shape (bins are fractional positions). Distinct material lands near
  * the 63/2 binomial mode (measured cross_min 16 at 400 bases), so the
  * default threshold 5 separates with a wide margin.
  *
  * Scale posture: one stateless decode+fingerprint pass
  * (`mapPartitions`, batched like every decode stage; null, non-audio
  * and empty payloads quarantine as zero rows), then the standard
  * bounded pigeonhole self-join — nothing all-pairs, nothing
  * collected.
  *
  * @param maxHamming fingerprint Hamming threshold
  * @param maxBucket  skew guard (see [[graft.dedup.SimHashDedup]])
  * @return `(id_l, id_r, hamming)` clip pairs with `id_l < id_r` and
  *         Hamming distance ≤ `maxHamming`
  */
object AudioDedup {

  /** `(id, fp)` fingerprints of the audio-kind rows (others
    * quarantine). */
  private def fingerprints(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(Media.BatchSize).flatMap(_.flatMap(m =>
        Media.audioHash64(m.kind, m.content).map(h => (m.media_id, h))))
    }.toDF("id", "fp")
  }

  def apply(
      media: Dataset[MediaRow],
      maxHamming: Int = 5,
      maxBucket: Int = 1000): DataFrame =
    SimHashDedup.fromFingerprints(fingerprints(media), "fp", "id",
      maxHamming, fpBits = 63, maxBucket)

  /** The pigeonhole blocks [[apply]] refuses at this `maxBucket` —
    * `(blk, key, members)`, the dropped-recall audit (same contract as
    * [[graft.dedup.SimHashDedup.droppedBlocks]]). */
  def droppedBlocks(
      media: Dataset[MediaRow],
      maxHamming: Int = 5,
      maxBucket: Int = 1000): DataFrame =
    Buckets.hotKeys(
      SimHashDedup.blockStream(
        fingerprints(media).select(col("id"), col("fp").as("sh64")),
        maxHamming, fpBits = 63),
      Seq("blk", "key"), maxBucket)
}
