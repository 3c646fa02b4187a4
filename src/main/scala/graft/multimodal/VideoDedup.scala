package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.dedup.{Buckets, SimHashDedup}

/** Perceptual VIDEO near-duplicate detection: per-frame DCT pHash →
  * pigeonhole-blocked frame-pair candidates → exact min-Hamming per
  * video pair. Two clips are near-dups when SOME frame pair comes
  * within `maxHamming` — the min-over-frame-pairs distance, which is
  * robust to re-encoding jitter and to frame-count drift (a clip with
  * extra leading frames still matches on the shared ones).
  *
  * Exactness: the blocking is the same pigeonhole over 63 fingerprint
  * bits as [[graft.dedup.SimHashDedup]] — a frame pair within
  * `maxHamming` agrees exactly on ≥ 1 of the `maxHamming + 1` blocks,
  * so every qualifying frame pair IS a candidate, and the per-video
  * minimum over qualifying candidates equals the true minimum for
  * every emitted pair. The oracle replays frames → pHash →
  * min-Hamming quadratically; this operator must agree row-for-row.
  *
  * Scale posture (the 100 TB question): nothing is all-pairs — frames
  * are hashed in one batched decode scan, candidates come from the
  * count-first bounded bucket join ([[graft.dedup.Buckets
  * .boundedPairs]]'s min-k state, hot boilerplate blocks refused
  * whole and auditable), and the final aggregation is a (video_l,
  * video_r) hash agg with map-side combine over only the
  * within-threshold frame pairs. Frame ids ride a single composite
  * Long ([[Media.frameHashes]]) so the bounded-pair machinery's
  * min-k-longs path applies unchanged.
  *
  * @param maxHamming frame-pair Hamming threshold (the video pair's
  *                   min distance must reach it)
  * @param maxBucket  pigeonhole skew guard — blocks with more member
  *                   FRAMES are refused whole (boilerplate mass:
  *                   identical intros, test cards), same audit
  *                   contract as [[graft.dedup.SimHashDedup]]
  * @return `(id_l, id_r, min_hamming)` video pairs with `id_l < id_r`
  *         and `min_hamming ≤ maxHamming`
  */
object VideoDedup {

  def apply(
      media: Dataset[MediaRow],
      maxHamming: Int = 5,
      maxBucket: Int = 1000): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 62,
      s"maxHamming=$maxHamming out of [0, 62]")
    // (fid, media_id, fp): one row per decoded frame; reused by the
    // blocking explode AND both sides of the candidate verify
    val frames = Media.frameHashes(media).cache()
    val exploded = SimHashDedup.blockStream(
      frames.select(col("fid").as("id"), col("fp").as("sh64")),
      maxHamming, fpBits = 63)
    val pairs = Buckets.boundedPairs(exploded, Seq("blk", "key"), "id",
      maxBucket, "all")
    // fids are nonnegative, so floor(x / 4096) is exact integer div
    val vid = (f: String) =>
      floor(col(f) / Media.MaxHashFrames).cast("long")
    pairs
      .join(frames.select(col("fid").as("id_l"), col("fp").as("h_l")),
        Seq("id_l"))
      .join(frames.select(col("fid").as("id_r"), col("fp").as("h_r")),
        Seq("id_r"))
      .select(
        least(vid("id_l"), vid("id_r")).as("vid_l"),
        greatest(vid("id_l"), vid("id_r")).as("vid_r"),
        bit_count(col("h_l").bitwiseXOR(col("h_r"))).as("hamming"))
      // same-video frame pairs are not duplicates of anything
      .filter(col("vid_l") =!= col("vid_r") &&
        col("hamming") <= maxHamming)
      .groupBy(col("vid_l").as("id_l"), col("vid_r").as("id_r"))
      .agg(min(col("hamming")).as("min_hamming"))
  }
}
