package graft

import graft.multimodal.Media

/** Audio near-dup threshold study on the gain-replica fixture: for each
  * base clip, the five amplitude-gain replicas' envelope fingerprints
  * ([[graft.multimodal.Media.audioFingerprint]]) are compared pairwise;
  * prints the planted max and the cross-base min Hamming distance,
  * which bound the `maxHamming` threshold below and above (no Spark
  * needed — the hashes are plain byte-array functions). Evidence
  * artifact for the q_audio_dedup threshold choice — not part of the
  * driver contract.
  *
  * Usage: runMain graft.AudioHashProbe [nBases]
  */
object AudioHashProbe {
  def main(args: Array[String]): Unit = {
    val nBases = if (args.nonEmpty) args(0).toInt else 400
    // replica fingerprints, indexed [base][replica]
    val byBase = (0 until nBases).map { b =>
      val base = b * 15L + 1
      Media.ContrastGains.zipWithIndex.map { case ((num, den), gi) =>
        Media.audioFingerprint(Media.decodePcm(
          Media.encodePcmGain(base, num, den,
            boost = Media.AudioBoost * gi)))
      }
    }
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val planted = for {
      reps <- byBase; i <- reps.indices; j <- (i + 1) until reps.size
    } yield ham(reps(i), reps(j))
    val cross = for {
      i <- byBase.indices; j <- (i + 1) until byBase.size
    } yield ham(byBase(i).head, byBase(j).head)
    // the full cross set over every gain x gain replica pair is 25x the
    // base pairs; sample the diagonal plus the worst base pair's full
    // replica grid for the histogram, but compute the MIN over all
    val crossAll = for {
      i <- byBase.indices; j <- (i + 1) until byBase.size
      a <- byBase(i); b <- byBase(j)
    } yield ham(a, b)
    def hist(xs: Seq[Int]): String =
      xs.groupBy(identity).toSeq.sortBy(_._1)
        .map { case (d, g) => s"$d:${g.size}" }.mkString(" ")
    println(s"""{"probe":"audio_hash_gain","planted_pairs":${planted.size},""" +
      s""""planted_max":${planted.max},"cross_min":${crossAll.min},""" +
      s""""planted_hist":"${hist(planted)}","cross_base_hist":"${hist(cross.take(3000))}"}""")
  }
}
