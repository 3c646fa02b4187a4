package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.dedup.{Buckets, SimHashDedup}

/** Perceptual VIDEO near-duplicate detection: per-frame DCT pHash →
  * DISTINCT-fingerprint pigeonhole candidates → exact min-Hamming per
  * video pair. Two clips are near-dups when SOME frame pair comes
  * within `maxHamming` — the min-over-frame-pairs distance, which is
  * robust to re-encoding jitter and to frame-count drift (a clip with
  * extra leading frames still matches on the shared ones).
  *
  * Exactness: the blocking is the same pigeonhole over 63 fingerprint
  * bits as [[graft.dedup.SimHashDedup]] — a fingerprint pair within
  * `maxHamming` agrees exactly on ≥ 1 of the `maxHamming + 1` blocks,
  * so every qualifying pair IS a candidate; distance-0 pairs (videos
  * sharing an exact fingerprint) ride their own equality bucket. The
  * min over (fp of A) × (fp of B) equals the min over A × B frame
  * pairs by definition, so collapsing duplicate fingerprints first
  * changes nothing semantically. The oracle replays frames → pHash →
  * min-Hamming quadratically; this operator must agree row-for-row.
  *
  * Scale posture (the 100 TB question): candidate work through
  * `maxHamming + 1` blocks of `63/(maxHamming+1)` bits is QUADRATIC in
  * the rows entering the blocks once they outnumber the per-block key
  * space (2^10 at the default threshold 5) — and raw frame streams get
  * there immediately (re-encoded replicas and within-clip stills share
  * exact hashes). So the operator pairs DISTINCT fingerprints, not
  * frames: measured at sf1 (~83k frames, perturbed corpus), the
  * frame-paired form read 37–58 s while the distinct-fingerprint form
  * reads ~3 s at identical output. The fingerprint doubles as the pair
  * id, so candidate Hamming is computed straight from the id columns —
  * no hash join-back. EVERY fan-out is bounded by `maxBucket`: the
  * pigeonhole blocks and the distance-0 buckets via
  * [[graft.dedup.Buckets.boundedPairs]]' min-k state, and the
  * fp → videos membership itself count-first — a fingerprint shared by
  * more than `maxBucket` videos (a test card, an identical intro) is
  * refused WHOLE from both the distance-0 and the nonzero path, so a
  * boilerplate frame can never fan a Hamming-neighbor pair out
  * quadratically. Refused fingerprints are boilerplate mass for
  * [[graft.dedup.ExactDedup]]; [[droppedFingerprints]] surfaces them.
  *
  * @param maxHamming frame-pair Hamming threshold (the video pair's
  *                   min distance must reach it)
  * @param maxBucket  skew guard — pigeonhole blocks with more DISTINCT
  *                   fingerprints, or single fingerprints shared by
  *                   more videos, are refused whole (boilerplate mass),
  *                   same audit contract as [[graft.dedup.SimHashDedup]]
  * @return `(id_l, id_r, min_hamming)` video pairs with `id_l < id_r`
  *         and `min_hamming ≤ maxHamming`
  */
object VideoDedup {

  /** The deduplicated `(fp, vid)` membership frame with fingerprints
    * shared by more than `maxBucket` videos refused whole — eagerly
    * pinned (`localCheckpoint`, not `cache`: checkpoint blocks are
    * freed by the ContextCleaner once the frame is unreachable, where
    * CacheManager entries pin storage until an explicit unpersist —
    * the leak a long-lived session would otherwise accumulate per
    * call). Consumed three times downstream (distance-0 buckets,
    * distinct-fp blocking, the two nonzero join-backs).
    */
  private def boundedMembers(media: Dataset[MediaRow],
      maxBucket: Int): DataFrame = {
    val members = Media.frameHashes(media)
      .select(col("fp"), col("media_id").as("vid"))
      .distinct()
    val bounded =
      if (maxBucket == Int.MaxValue) members
      else members.join(
        Buckets.hotKeys(members, Seq("fp"), maxBucket).select(col("fp")),
        Seq("fp"), "left_anti")
    bounded.localCheckpoint(true)
  }

  /** The fingerprints [[apply]] refuses at this `maxBucket` —
    * `(fp, members)` with `members` = how many videos share the
    * fingerprint. The dropped-recall audit (same contract as
    * [[graft.dedup.SimHashDedup.droppedBlocks]]).
    */
  def droppedFingerprints(media: Dataset[MediaRow],
      maxBucket: Int = 1000): DataFrame =
    Buckets.hotKeys(
      Media.frameHashes(media)
        .select(col("fp"), col("media_id").as("vid")).distinct(),
      Seq("fp"), maxBucket)

  def apply(
      media: Dataset[MediaRow],
      maxHamming: Int = 5,
      maxBucket: Int = 1000): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 62,
      s"maxHamming=$maxHamming out of [0, 62]")
    // (fp, vid) memberships, deduplicated — the collapse that keeps the
    // block population at |distinct fps|, not |frames| — with hot
    // boilerplate fingerprints refused whole (symmetric across the
    // distance-0 AND nonzero paths)
    val members = boundedMembers(media, maxBucket)
    // distance-0 pairs: videos sharing one exact fingerprint (the
    // per-fp bound is redundant after boundedMembers but kept — the
    // min-k state ceiling is the operator's memory contract)
    val zero = Buckets.boundedPairs(members, Seq("fp"), "vid",
        maxBucket, "all")
      .select(col("id_l").as("vid_l"), col("id_r").as("vid_r"),
        lit(0).as("hamming"))
    // distinct fingerprints pair through the pigeonhole blocks; the
    // fingerprint IS the pair id, so Hamming comes straight from the
    // id columns (63-bit fps are nonnegative Longs — ordering is safe)
    val fps = members.select(col("fp").as("id"), col("fp").as("sh64"))
      .distinct()
    val exploded = SimHashDedup.blockStream(fps, maxHamming, fpBits = 63)
    val fpPairs = Buckets.boundedPairs(exploded, Seq("blk", "key"), "id",
        maxBucket, "all")
      .select(col("id_l"), col("id_r"),
        bit_count(col("id_l").bitwiseXOR(col("id_r"))).as("hamming"))
      .filter(col("hamming") <= maxHamming) // > 0 by distinctness
    val nonzero = fpPairs
      .join(members.select(col("fp").as("id_l"), col("vid").as("vid_l")),
        Seq("id_l"))
      .join(members.select(col("fp").as("id_r"), col("vid").as("vid_r")),
        Seq("id_r"))
      .select(col("vid_l"), col("vid_r"), col("hamming"))
    zero.union(nonzero)
      // same-video frame pairs are not duplicates of anything
      .filter(col("vid_l") =!= col("vid_r"))
      .select(least(col("vid_l"), col("vid_r")).as("id_l"),
        greatest(col("vid_l"), col("vid_r")).as("id_r"),
        col("hamming"))
      .groupBy("id_l", "id_r")
      .agg(min(col("hamming")).as("min_hamming"))
  }
}
