package graft

import graft.multimodal.Media

/** Video near-dup threshold study on the jittered-replica fixture: for
  * each base clip, the five row-0-jittered replicas' per-frame pHashes
  * are compared via the MIN-over-frame-pairs Hamming distance
  * ([[graft.multimodal.VideoDedup]]'s pair metric); prints the planted
  * max and the cross-base min (over every replica × replica pair of
  * different bases), which bound the `maxHamming` threshold below and
  * above (no Spark needed — the hashes are plain byte-array
  * functions). Evidence artifact for the q_media_video_dedup threshold
  * choice — not part of the driver contract.
  *
  * Usage: runMain graft.VideoHashProbe [nBases]
  */
object VideoHashProbe {
  def main(args: Array[String]): Unit = {
    val nBases = if (args.nonEmpty) args(0).toInt else 40
    // replica fingerprint sets, indexed [base][replica] -> frame hashes
    val byBase = (0 until nBases).map { b =>
      val base = b * 15L + 2
      val nFrames = (base / 15 % 3 + 4).toInt
      (0 until 5).map { delta =>
        Media.decodeVideoFrames(Media.encodeVideoJitter(
            base, delta, nFrames, Media.VideoW, Media.VideoH))
          .map(Media.pHashImage)
      }
    }
    def minHam(a: Seq[Long], b: Seq[Long]): Int =
      (for (x <- a; y <- b) yield java.lang.Long.bitCount(x ^ y)).min
    val planted = for {
      reps <- byBase; i <- reps.indices; j <- (i + 1) until reps.size
    } yield minHam(reps(i), reps(j))
    val cross = for {
      i <- byBase.indices; j <- (i + 1) until byBase.size
      a <- byBase(i); b <- byBase(j)
    } yield minHam(a, b)
    def hist(xs: Seq[Int]): String =
      xs.groupBy(identity).toSeq.sortBy(_._1)
        .map { case (d, g) => s"$d:${g.size}" }.mkString(" ")
    println(s"""{"probe":"video_hash_jitter","planted_pairs":${planted.size},""" +
      s""""planted_max":${planted.max},"cross_min":${cross.min},""" +
      s""""planted_hist":"${hist(planted)}","cross_hist":"${hist(cross.take(2000))}"}""")
  }
}
