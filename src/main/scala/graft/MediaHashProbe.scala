package graft

import graft.multimodal.Media

/** aHash-vs-pHash robustness study on the contrast-jitter fixture: for
  * each base image, the five integer-gain replicas' fingerprints are
  * compared pairwise; prints the Hamming-distance distribution of
  * PLANTED pairs for both hashes (no Spark needed — the hashes are
  * plain byte-array functions). Evidence artifact for SCALING.md and
  * the q_media_phash threshold choice — not part of the driver
  * contract.
  *
  * Usage: runMain graft.MediaHashProbe [nBases]
  */
object MediaHashProbe {
  def main(args: Array[String]): Unit = {
    val nBases = if (args.nonEmpty) args(0).toInt else 40
    def dist(fps: Seq[Long]): Seq[Int] =
      for { i <- fps.indices; j <- (i + 1) until fps.size }
        yield java.lang.Long.bitCount(fps(i) ^ fps(j))
    val (aAll, pAll) = (Seq.newBuilder[Int], Seq.newBuilder[Int])
    for (b <- 0 until nBases) {
      val base = b * 15L
      val payloads = Media.ContrastGains.map { case (n, d) =>
        Media.encodePngContrast(base, n, d, Media.ImgW, Media.ImgH) }
      aAll ++= dist(payloads.map(p => Media.aHash64("image", p).get))
      pAll ++= dist(payloads.map(p => Media.pHash64("image", p).get))
    }
    def hist(xs: Seq[Int]): String =
      xs.groupBy(identity).toSeq.sortBy(_._1)
        .map { case (d, g) => s"$d:${g.size}" }.mkString(" ")
    val (a, p) = (aAll.result(), pAll.result())
    // cross-base separation over ALL replica pairs of DIFFERENT bases
    // (every gain × gain combination, not just the identity replicas) —
    // the true nearest non-planted pair bounds the threshold from above
    def crossMin(hash: (String, Array[Byte]) => Option[Long]): Int = {
      val byBase = (0 until nBases).map(b =>
        Media.ContrastGains.map { case (n, d) => hash("image",
          Media.encodePngContrast(b * 15L, n, d, Media.ImgW, Media.ImgH)).get })
      (for {
        i <- byBase.indices; j <- (i + 1) until byBase.size
        x <- byBase(i); y <- byBase(j)
      } yield java.lang.Long.bitCount(x ^ y)).min
    }
    val aX = crossMin(Media.aHash64(_, _))
    val pX = crossMin(Media.pHash64)
    println(s"""{"probe":"media_hash_contrast","pairs":${a.size},""" +
      s""""ahash_max":${a.max},"phash_max":${p.max},""" +
      s""""ahash_cross_min":$aX,"phash_cross_min":$pX,""" +
      s""""ahash_hist":"${hist(a)}","phash_hist":"${hist(p)}"}""")
  }
}
