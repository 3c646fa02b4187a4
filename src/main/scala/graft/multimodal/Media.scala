package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

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
    dec_width: Int,          // dimensions read back out of the DECODED payload
    dec_height: Int,         // (0 for audio; 0,0 with empty features = corrupt)
    features: Array[Float])

/** Multimodal column plumbing — batch decode / feature-extract / resize /
  * frame-sample over `binary` media columns.
  *
  * Execution model: the Scala-native analog of PySpark's `mapInPandas` is
  * `Dataset.mapPartitions` — each partition is processed as an iterator,
  * and the decode stages batch rows (`BatchSize`) so decoder setup
  * amortizes per-call overhead exactly like an Arrow batch would.
  *
  * The decode is REAL: images are PNG payloads decoded through
  * `javax.imageio` (JDK-bundled, present on every executor), audio is
  * s16le PCM parsed byte-for-byte, video is a length-prefixed sequence of
  * PNG key frames. Features are band means over the DECODED pixels /
  * samples, so a wrong decode produces wrong features — which is what the
  * differential oracle checks (the test payloads are encoded from a known
  * pixel formula the oracle recomputes arithmetically; see
  * [[fromDocuments]]).
  *
  * A payload `ImageIO` cannot parse yields `dec_width = dec_height = 0`
  * with empty features instead of failing the job — at corpus scale a
  * corrupt blob must be quarantineable (filter on `size(features) = 0`),
  * not a stage killer.
  */
object Media {

  /** Rows per decode batch — the Arrow-batch-size analog. */
  val BatchSize = 64

  // ── deterministic test-payload formulas ────────────────────────────
  // Shared by the PNG/PCM encoders below, the specs, and the DuckDB
  // oracle (which recomputes them arithmetically instead of decoding).
  // Channel c of pixel (x, y) in frame f of media `id`:
  //   r = (id·31 + f·29 + x·7  + y·13) mod 256
  //   g = (id·17 + f·41 + x·11 + y·5 ) mod 256
  //   b = (id·23 + f·59 + x·3  + y·19) mod 256
  // Audio sample i of media `id`: ((id·7919 + i·104729) mod 65536) − 32768.

  def pxR(id: Long, f: Int, x: Int, y: Int): Int =
    Math.floorMod(id * 31 + f * 29 + x * 7 + y * 13, 256).toInt
  def pxG(id: Long, f: Int, x: Int, y: Int): Int =
    Math.floorMod(id * 17 + f * 41 + x * 11 + y * 5, 256).toInt
  def pxB(id: Long, f: Int, x: Int, y: Int): Int =
    Math.floorMod(id * 23 + f * 59 + x * 3 + y * 19, 256).toInt
  def pcmSample(id: Long, i: Int): Int =
    Math.floorMod(id * 7919 + i * 104729L, 65536).toInt - 32768

  // ── encoders (test-fixture synthesis; real codecs, formula pixels) ──

  /** Lossless PNG of the formula pixels — a REAL image payload any PNG
    * decoder reads back bit-exactly.
    */
  def encodePng(id: Long, frame: Int, w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y,
          (pxR(id, frame, x, y) << 16) | (pxG(id, frame, x, y) << 8) |
            pxB(id, frame, x, y))
        x += 1
      }
      y += 1
    }
    val baos = new ByteArrayOutputStream()
    ImageIO.setUseCache(false) // no temp-file spooling on executors
    ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** Raw s16le PCM of the formula samples. */
  def encodePcm(id: Long, nSamples: Int): Array[Byte] = {
    val out = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val s = pcmSample(id, i)
      out(2 * i) = (s & 0xff).toByte
      out(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  /** Minimal video container: per frame, a 4-byte big-endian length
    * prefix followed by that frame's PNG bytes.
    */
  def encodeVideo(id: Long, nFrames: Int, w: Int, h: Int): Array[Byte] = {
    val baos = new ByteArrayOutputStream()
    var f = 0
    while (f < nFrames) {
      val png = encodePng(id, f, w, h)
      baos.write(png.length >>> 24); baos.write((png.length >>> 16) & 0xff)
      baos.write((png.length >>> 8) & 0xff); baos.write(png.length & 0xff)
      baos.write(png, 0, png.length)
      f += 1
    }
    baos.toByteArray
  }

  // ── decoders ───────────────────────────────────────────────────────

  /** `javax.imageio` decode; None when the payload is not a readable
    * image (corrupt-blob quarantine path).
    */
  def decodeImage(content: Array[Byte]): Option[BufferedImage] = {
    ImageIO.setUseCache(false)
    try Option(ImageIO.read(new ByteArrayInputStream(content)))
    catch { case _: Exception => None }
  }

  /** s16le PCM parse (bytes → samples). Odd trailing byte is ignored. */
  def decodePcm(content: Array[Byte]): Array[Int] = {
    val n = content.length / 2
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      out(i) = ((content(2 * i + 1) << 8) | (content(2 * i) & 0xff))
      i += 1
    }
    out
  }

  /** Parse the length-prefixed frame container; stops at the first
    * malformed prefix or unreadable frame.
    */
  def decodeVideoFrames(content: Array[Byte]): Seq[BufferedImage] = {
    val frames = Seq.newBuilder[BufferedImage]
    var off = 0
    var ok = true
    while (ok && off + 4 <= content.length) {
      val len = ((content(off) & 0xff) << 24) | ((content(off + 1) & 0xff) << 16) |
        ((content(off + 2) & 0xff) << 8) | (content(off + 3) & 0xff)
      if (len < 0 || off + 4 + len > content.length) ok = false
      else {
        decodeImage(java.util.Arrays.copyOfRange(content, off + 4, off + 4 + len)) match {
          case Some(img) => frames += img; off += 4 + len
          case None      => ok = false
        }
      }
    }
    frames.result()
  }

  /** Mean luminance `((r+g+b)/3)/255` of an image region, from DECODED
    * pixels.
    */
  private def meanLum(img: BufferedImage, x0: Int, x1: Int, y0: Int, y1: Int): Double = {
    var sum = 0.0
    var n = 0
    var y = y0
    while (y < y1) {
      var x = x0
      while (x < x1) {
        val rgb = img.getRGB(x, y)
        sum += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3.0 / 255.0
        x += 1
        n += 1
      }
      y += 1
    }
    if (n == 0) 0.0 else sum / n
  }

  /** Per-kind feature extraction over decoded payloads (all accumulation
    * in double, truncated to float at the end — so an engine summing in
    * a different order produces the same float32):
    *  - image: `dim` horizontal-band luminance means — band `j` covers
    *    rows `y` with `floor(y·dim/h) = j`;
    *  - audio: `dim` band means of normalized samples `(s/32768+1)/2`,
    *    band `j` = samples `i` with `floor(i·dim/n) = j`;
    *  - video: feature `j` = whole-frame mean luminance of decoded frame
    *    `min(j, frames−1)`.
    */
  private[multimodal] def decodeFeatures(m: MediaRow, dim: Int): MediaFeatures = {
    def empty = MediaFeatures(m.media_id, m.kind, m.content.length, 0, 0, Array.empty)
    m.kind match {
      case "image" =>
        decodeImage(m.content) match {
          case Some(img) =>
            val h = img.getHeight
            val out = new Array[Float](dim)
            val bands = Array.fill(dim)(0.0)
            val counts = Array.fill(dim)(0)
            var y = 0
            while (y < h) {
              val j = math.min(y * dim / h, dim - 1)
              var x = 0
              while (x < img.getWidth) {
                val rgb = img.getRGB(x, y)
                bands(j) +=
                  (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3.0 / 255.0
                counts(j) += 1
                x += 1
              }
              y += 1
            }
            var j = 0
            while (j < dim) {
              out(j) = (if (counts(j) == 0) 0.0 else bands(j) / counts(j)).toFloat
              j += 1
            }
            MediaFeatures(m.media_id, m.kind, m.content.length,
              img.getWidth, img.getHeight, out)
          case None => empty
        }
      case "audio" =>
        val samples = decodePcm(m.content)
        val n = samples.length
        if (n == 0) empty
        else {
          val bands = Array.fill(dim)(0.0)
          val counts = Array.fill(dim)(0)
          var i = 0
          while (i < n) {
            val j = math.min(i * dim / n, dim - 1)
            bands(j) += (samples(i) / 32768.0 + 1.0) / 2.0
            counts(j) += 1
            i += 1
          }
          val out = new Array[Float](dim)
          var j = 0
          while (j < dim) {
            out(j) = (if (counts(j) == 0) 0.0 else bands(j) / counts(j)).toFloat
            j += 1
          }
          MediaFeatures(m.media_id, m.kind, m.content.length, 0, 0, out)
        }
      case "video" =>
        val frames = decodeVideoFrames(m.content)
        if (frames.isEmpty) empty
        else {
          val out = new Array[Float](dim)
          var j = 0
          while (j < dim) {
            val img = frames(math.min(j, frames.size - 1))
            out(j) = meanLum(img, 0, img.getWidth, 0, img.getHeight).toFloat
            j += 1
          }
          MediaFeatures(m.media_id, m.kind, m.content.length,
            frames.head.getWidth, frames.head.getHeight, out)
        }
      case _ => empty
    }
  }

  /** Decode + feature-extract: batched `mapPartitions`; one feature vector
    * of `dim` floats per media row, derived from genuinely decoded
    * pixels/samples.
    */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 16): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        // decoder state (ImageIO readers) is JVM-wide; the batch shape is
        // what a native decoder would process per call
        batch.map(decodeFeatures(_, dim))
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

  /** Integer luminance grid of a media row's DECODED image: one row per
    * media, `lum(r·gw + c)` = Σ over grid cell `(r, c)`'s pixels of
    * `r + g + b` (cell row `r` = pixel rows `y` with
    * `floor(y·gh/h) = r`, likewise columns), plus per-cell and total
    * pixel counts. ALL-INTEGER on purpose: the perceptual fingerprint
    * downstream (the classic 8×8 average-hash) thresholds cell means
    * against the global mean, and with integer sums that comparison is
    * the exact cross-multiplication
    * `lum_j · n_px > total · cell_px_j` — engine-bit-identical with
    * zero float tolerance (float cell means would make the threshold
    * depend on each engine's summation order). Non-image (or corrupt)
    * rows yield an empty grid — quarantineable, never a stage killer.
    */
  final case class LumGrid(media_id: Long, kind: String,
      lum: Array[Long], cell_px: Array[Long], n_px: Long)

  def extractLumGrid(media: Dataset[MediaRow], gw: Int = 8,
      gh: Int = 8): Dataset[LumGrid] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.map { m =>
          val img = if (m.kind == "image") decodeImage(m.content) else None
          img match {
            case Some(im) =>
              val h = im.getHeight
              val w = im.getWidth
              val lum = new Array[Long](gw * gh)
              val cnt = new Array[Long](gw * gh)
              var y = 0
              while (y < h) {
                val r = math.min(y * gh / h, gh - 1)
                var x = 0
                while (x < w) {
                  val j = r * gw + math.min(x * gw / w, gw - 1)
                  val rgb = im.getRGB(x, y)
                  lum(j) +=
                    ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
                  cnt(j) += 1
                  x += 1
                }
                y += 1
              }
              LumGrid(m.media_id, m.kind, lum, cnt, cnt.sum)
            case None =>
              LumGrid(m.media_id, m.kind, Array.empty, Array.empty, 0L)
          }
        }
      }
    }
  }

  /** 64-bit average-hash of an image payload: decode, 8×8 integer
    * luminance grid, bit `j` set iff cell `j`'s mean luminance exceeds
    * the global mean — the exact cross-multiplied integer comparison
    * (`lum_j · n_px > total · cell_px_j`), so the fingerprint is
    * bit-identical to the [[extractLumGrid]]-based DataFrame pipeline
    * and to the DuckDB arithmetic replay. `None` for non-image or
    * undecodable payloads (quarantine, not failure). Stateless —
    * legal inside streaming plans.
    */
  def aHash64(kind: String, content: Array[Byte],
      gw: Int = 8, gh: Int = 8): Option[Long] = {
    require(gw * gh <= 64, "aHash64 needs gw*gh <= 64 bits")
    val img = if (kind == "image") decodeImage(content) else None
    img.map { im =>
      val h = im.getHeight
      val w = im.getWidth
      require(w.toLong * h <= MaxAHashPixels,
        s"aHash input claims $w x $h = ${w.toLong * h} pixels " +
          s"(> $MaxAHashPixels): the cross-multiplied threshold " +
          "comparison would overflow Long — refusing to hash wrong")
      val lum = new Array[Long](gw * gh)
      val cnt = new Array[Long](gw * gh)
      var y = 0
      while (y < h) {
        val r = math.min(y * gh / h, gh - 1)
        var x = 0
        while (x < w) {
          val j = r * gw + math.min(x * gw / w, gw - 1)
          val rgb = im.getRGB(x, y)
          lum(j) += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
          cnt(j) += 1
          x += 1
        }
        y += 1
      }
      val total = lum.sum
      val nPx = cnt.sum
      var bits = 0L
      var j = 0
      while (j < gw * gh) {
        if (lum(j) * nPx > total * cnt(j)) bits |= 1L << j
        j += 1
      }
      bits
    }
  }

  /** Integer-quantized DCT basis for [[pHash64]]:
    * `DctTable(k)(u) = floor(cos(π(2k+1)u/16) · 2^14)` — computed ONCE
    * driver-side (so no cross-engine `cos` agreement is ever needed:
    * the DuckDB oracle embeds these 64 integers as literals) and used
    * as exact Long factors in the DCT sums.
    */
  val DctTableScale: Long = 1L << 14
  lazy val DctTable: IndexedSeq[IndexedSeq[Long]] =
    (0 until 8).map(k => (0 until 8).map(u =>
      math.floor(math.cos(math.Pi * (2 * k + 1) * u / 16.0)
        * DctTableScale).toLong))

  /** Fixed-point scale of the per-cell mean luminance feeding the DCT:
    * `mean_j = floor(lum_j · 2^16 / cnt_j)`. Normalizing by the CELL
    * pixel count (not the raw sum) is what makes the brightness-shift
    * invariance hold for image dims that do not divide 8 — with raw
    * sums a constant shift adds `3·δ·cnt_j`, which varies by cell when
    * cells are uneven and is therefore NOT DC-only. With floored
    * scaled means the shift is exactly equivariant even under the
    * truncation: `floor((lum_j + 3·δ·cnt_j)·S / cnt_j) =
    * floor(lum_j·S / cnt_j) + 3·δ·S` (the added term is divisible by
    * `cnt_j`), a constant across cells ⇒ DC-only ⇒ the 63 AC sign
    * bits are untouched (spec-pinned on a 10×10 image).
    */
  val MeanScale: Long = 1L << 16

  /** Pixel-count ceiling for [[pHash64]]/[[pHashImage]] (2^34 ≈ 17
    * gigapixels): keeps `lum_j · MeanScale` exact —
    * `765 · 2^34 · 2^16 < 2^60` — with the API still accepting any
    * real decoded image. Payloads above it fail LOUDLY (a require,
    * not a wrong hash): a decoded claim of > 17 GP is malformed, not
    * merely large.
    */
  val MaxPHashPixels: Long = 1L << 34

  /** [[MaxPHashPixels]] analog for [[aHash64]], whose threshold
    * comparison `lum_j · n_px > total · cnt_j` is quadratic in the
    * pixel count: `765 · (2^26)^2 < 2^63` — 67 MP, guarded loudly.
    */
  val MaxAHashPixels: Long = 1L << 26

  /** 63-bit DCT perceptual hash of one DECODED image (the classic
    * pHash recipe on the same integer grid machinery as [[aHash64]]):
    * 8×8 integer luminance grid → per-cell fixed-point MEAN
    * (`floor(lum_j · MeanScale / cnt_j)` — see [[MeanScale]] for why
    * means, not sums) → exact Long 2-D DCT-II against the quantized
    * [[DctTable]] basis → bit `u·8+v−1` set iff coefficient
    * `C(u,v) > 0`, DC (0,0) excluded. Sign-of-coefficient bits are
    * EXACTLY invariant to uniform brightness shifts for ANY image
    * dims (shift ⇒ +`3·δ·MeanScale` on every cell mean ⇒ DC-only;
    * exact under the floor, see [[MeanScale]]) and invariant to
    * uniform luminance gain up to the floor rounding (DCT is linear;
    * a gain scales every mean, and so every coefficient, positively) —
    * the transforms that flip [[aHash64]]'s mean-threshold bits once
    * clamping makes them non-uniform; the low-frequency coefficients
    * carry large exact magnitudes, so clamp distortion rarely crosses
    * zero. All arithmetic is exact Long (|mean| ≤ 765·2^16 < 2^26,
    * ×2^28 basis factors ×64 terms < 2^60), so DuckDB replays the
    * hash bit-for-bit from the pixel formulas and the embedded basis
    * literals.
    */
  def pHashImage(im: BufferedImage): Long = {
    val h = im.getHeight
    val w = im.getWidth
    require(w.toLong * h <= MaxPHashPixels,
      s"pHash input claims $w x $h = ${w.toLong * h} pixels " +
        s"(> $MaxPHashPixels): the exact-Long DCT bound would overflow " +
        "— refusing to hash wrong")
    val lum = new Array[Long](64)
    val cnt = new Array[Long](64)
    var y = 0
    while (y < h) {
      val r = math.min(y * 8 / h, 7)
      var x = 0
      while (x < w) {
        val j = r * 8 + math.min(x * 8 / w, 7)
        val rgb = im.getRGB(x, y)
        lum(j) += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
        cnt(j) += 1
        x += 1
      }
      y += 1
    }
    val mean = new Array[Long](64)
    var j = 0
    while (j < 64) {
      mean(j) = if (cnt(j) == 0) 0L else lum(j) * MeanScale / cnt(j)
      j += 1
    }
    dctSignBits63(mean)
  }

  /** Shared tail of [[pHashImage]] and [[audioFingerprint]]: exact Long
    * 2-D DCT-II of a 64-entry fixed-point mean grid (row-major 8×8)
    * against the quantized [[DctTable]] basis, folded to the 63 AC
    * coefficient sign bits (DC excluded). Exact under the callers'
    * overflow envelopes: |mean| < 2^26 ⇒ |coefficient| < 2^26 · 2^28 ·
    * 64 = 2^60.
    */
  private def dctSignBits63(mean: Array[Long]): Long = {
    var bits = 0L
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        if (u != 0 || v != 0) {
          var cuv = 0L
          var r = 0
          while (r < 8) {
            var c = 0
            while (c < 8) {
              cuv += mean(r * 8 + c) * DctTable(r)(u) * DctTable(c)(v)
              c += 1
            }
            r += 1
          }
          if (cuv > 0) bits |= 1L << (u * 8 + v - 1)
        }
        v += 1
      }
      u += 1
    }
    bits
  }

  /** [[pHashImage]] over an encoded payload: `None` for
    * non-image/undecodable payloads (quarantine, not failure).
    * Stateless — streaming-legal.
    */
  def pHash64(kind: String, content: Array[Byte]): Option[Long] = {
    val img = if (kind == "image") decodeImage(content) else None
    img.map(pHashImage)
  }

  /** [[encodePng]] with a per-replica integer CONTRAST gain: each
    * channel becomes `min(255, ch · num / den)` (exact integer
    * truncating division — replayable in any engine, unlike a float
    * gamma curve). Gains > 1 CLAMP the bright tail, which is the
    * non-uniform distortion that separates the mean-threshold aHash
    * from the sign-of-DCT pHash.
    */
  def encodePngContrast(id: Long, num: Int, den: Int, w: Int,
      h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        def g(ch: Int): Int = math.min(255, ch * num / den)
        img.setRGB(x, y,
          (g(pxR(id, 0, x, y)) << 16) | (g(pxG(id, 0, x, y)) << 8) |
            g(pxB(id, 0, x, y)))
        x += 1
      }
      y += 1
    }
    val baos = new ByteArrayOutputStream()
    ImageIO.setUseCache(false)
    ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** Contrast gains of the [[contrastDupImages]] fixture, by replica
    * index 0..4: identity, +12.5%, +25%, −20%, −12.5%. */
  val ContrastGains: IndexedSeq[(Int, Int)] =
    IndexedSeq((1, 1), (9, 8), (5, 4), (4, 5), (7, 8))

  /** Contrast-jittered near-dup image fixture (the [[nearDupImages]]
    * grouping with [[encodePngContrast]] replicas): groups of five
    * image ids share one base picture, each re-encoded under its own
    * integer gain — perceptually near-identical, byte-distinct, and
    * (for gains > 1) clamp-distorted in the bright tail.
    */
  def contrastDupImages(spark: SparkSession,
      docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.filter(col("doc_id") % 3 === 0)
      .select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val base = id - id % 15
          val (num, den) = ContrastGains(((id % 15) / 3).toInt)
          MediaRow(id, "image", encodePngContrast(base, num, den, ImgW, ImgH),
            ImgW, ImgH, 0, 0)
        }
      }
  }

  /** [[encodePng]] with a per-replica brightness jitter on row 0: each
    * channel of the `y = 0` pixels is brightened by `delta` (clamped at
    * 255) — a REAL re-encoded PNG whose bytes differ from the base
    * image while the picture stays perceptually near-identical. The
    * near-dup fixture generator for the media dedup query/specs.
    */
  def encodePngJitter(id: Long, delta: Int, w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val d = if (y == 0) delta else 0
        img.setRGB(x, y,
          (math.min(255, pxR(id, 0, x, y) + d) << 16) |
            (math.min(255, pxG(id, 0, x, y) + d) << 8) |
            math.min(255, pxB(id, 0, x, y) + d))
        x += 1
      }
      y += 1
    }
    val baos = new ByteArrayOutputStream()
    ImageIO.setUseCache(false)
    ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** Near-dup image fixture over the documents table: the image-kind
    * ids (`doc_id % 3 = 0`) form groups of five consecutive image ids
    * (`base = doc_id − doc_id mod 15`) sharing ONE base picture; each
    * replica re-encodes it with its own row-0 brightness jitter
    * (`delta = (doc_id mod 15) / 3` ∈ 0..4) — five perceptually
    * near-identical PNGs with pairwise-distinct bytes, so exact dedup
    * finds nothing and the perceptual path must.
    */
  def nearDupImages(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.filter(col("doc_id") % 3 === 0)
      .select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val base = id - id % 15
          val delta = ((id % 15) / 3).toInt
          MediaRow(id, "image", encodePngJitter(base, delta, ImgW, ImgH),
            ImgW, ImgH, 0, 0)
        }
      }
  }

  /** Per-clip pixel formulas of the [[nearDupVideos]] fixture: the
    * shared [[pxR]]/[[pxG]]/[[pxB]] formulas carry ONE spatial
    * gradient for every id (only the mod-256 offset varies), so
    * foreign clips frequently land within pHash Hamming 2 of each
    * other -- no separating threshold exists (measured by
    * [[graft.VideoHashProbe]]). These variants make the gradient
    * itself id-dependent, decorrelating foreign clips while staying
    * pure integer arithmetic the DuckDB oracle replays verbatim.
    */
  def vxR(id: Long, f: Int, x: Int, y: Int): Int =
    Math.floorMod(id * 31 + f * 29 + x * (7 + id % 5) + y * (13 + id % 7),
      256).toInt
  def vxG(id: Long, f: Int, x: Int, y: Int): Int =
    Math.floorMod(id * 17 + f * 41 + x * (11 + id % 3) + y * (5 + id % 11),
      256).toInt
  def vxB(id: Long, f: Int, x: Int, y: Int): Int =
    Math.floorMod(id * 23 + f * 59 + x * (3 + id % 13) + y * (19 + id % 2),
      256).toInt

  /** Framed-PNG clip of the [[vxR]]-family pixels with a per-replica
    * brightness jitter of `8 * delta` on the top 4 rows of EVERY frame
    * (strong enough that the DCT sign bits actually move -- a
    * row-0-only nudge leaves all five replicas hash-IDENTICAL, which
    * would let exact fingerprint dedup pass the fixture; measured by
    * [[graft.VideoHashProbe]]): a REAL re-encoded payload whose bytes
    * differ from the base video while every frame stays perceptually
    * near-identical. The near-dup fixture generator for the video
    * dedup query/specs.
    */
  def encodeVideoJitter(id: Long, delta: Int, nFrames: Int, w: Int,
      h: Int): Array[Byte] = {
    val baos = new ByteArrayOutputStream()
    var f = 0
    while (f < nFrames) {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val d = if (y < 4) delta * 8 else 0
          img.setRGB(x, y,
            (math.min(255, vxR(id, f, x, y) + d) << 16) |
              (math.min(255, vxG(id, f, x, y) + d) << 8) |
              math.min(255, vxB(id, f, x, y) + d))
          x += 1
        }
        y += 1
      }
      val fb = new ByteArrayOutputStream()
      ImageIO.setUseCache(false)
      ImageIO.write(img, "png", fb)
      val png = fb.toByteArray
      baos.write(png.length >>> 24); baos.write((png.length >>> 16) & 0xff)
      baos.write((png.length >>> 8) & 0xff); baos.write(png.length & 0xff)
      baos.write(png, 0, png.length)
      f += 1
    }
    baos.toByteArray
  }

  /** Near-dup VIDEO fixture over the documents table (the
    * [[nearDupImages]] grouping on the video-kind ids): the video ids
    * (`doc_id % 3 = 2`) form groups of five consecutive video ids
    * (`base = doc_id − doc_id mod 15 + 2`) sharing ONE base clip of
    * `(base/15 mod 3) + 4` formula frames; each replica re-encodes it
    * with its own per-frame row-0 brightness jitter
    * (`delta = (doc_id mod 15 − 2) / 3` ∈ 0..4) — five perceptually
    * near-identical framed-PNG payloads with pairwise-distinct bytes,
    * so exact dedup finds nothing and the per-frame perceptual path
    * must.
    */
  def nearDupVideos(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.filter(col("doc_id") % 3 === 2)
      .select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val base = id - id % 15 + 2
          val delta = ((id % 15 - 2) / 3).toInt
          val nFrames = (base / 15 % 3 + 4).toInt
          MediaRow(id, "video",
            encodeVideoJitter(base, delta, nFrames, VideoW, VideoH),
            VideoW, VideoH, 0, nFrames)
        }
      }
  }

  // ── audio perceptual fingerprint ───────────────────────────────────

  /** Envelope bins of [[audioFingerprint]] — an 8×8 DCT grid, the same
    * transform machinery as the image pHash. */
  val AudioBins = 64

  /** Fixed-point scale of the per-bin mean |amplitude| feeding the
    * audio DCT: `mean_j = floor(Σ|s| · 2^11 / cnt_j)`. 2^11 (not the
    * image path's 2^16) keeps the exact-Long DCT bound with 16-bit
    * samples: |s| ≤ 2^15 ⇒ mean ≤ 2^26, ×2^28 basis factors ×64 terms
    * < 2^60 — the same overflow envelope as [[pHashImage]]. The
    * cnt-normalization buys the same invariances as for images: a
    * uniform amplitude GAIN scales every bin mean (and so every DCT
    * coefficient) positively ⇒ the sign bits hold up to floor
    * rounding, and sample-count drift (re-sampled copies) keeps the
    * envelope shape because bins are fractional positions, not
    * absolute offsets.
    */
  val AudioMeanScale: Long = 1L << 11

  /** 63-bit perceptual fingerprint of a PCM sample array — the audio
    * member of the perceptual family ([[aHash64]]/[[pHashImage]] for
    * images, [[frameHashes]] for video): the |amplitude| envelope over
    * [[AudioBins]] time bins (bin `j` = samples `i` with
    * `floor(i·64/n) = j`, the [[decodeFeatures]] binning), per-bin
    * fixed-point MEAN (`floor(Σ|s| · AudioMeanScale / cnt_j)`),
    * reshaped row-major 8×8 and pushed through the exact Long 2-D DCT
    * against the quantized [[DctTable]] basis — bit `u·8+v−1` set iff
    * coefficient `C(u,v) > 0`, DC excluded. Row index = coarse
    * position in the clip, column = fine position, so the sign bits
    * capture the envelope's time-frequency structure (the
    * band-sign recipe of classic robust audio fingerprints, on this
    * repo's exact-integer discipline: every step is Long arithmetic a
    * SQL oracle replays bit-for-bit from the embedded basis literals).
    *
    * Overflow: Σ|s| ≤ 2^15·n with n ≤ 2^30 (a 2 GB payload), so
    * `Σ|s| · AudioMeanScale` < 2^56 — exact for any real payload.
    */
  def audioFingerprint(samples: Array[Int]): Long = {
    val n = samples.length
    val sum = new Array[Long](AudioBins)
    val cnt = new Array[Long](AudioBins)
    var i = 0
    while (i < n) {
      val j = (i.toLong * AudioBins / n).toInt
      sum(j) += math.abs(samples(i))
      cnt(j) += 1
      i += 1
    }
    val mean = new Array[Long](AudioBins)
    var j = 0
    while (j < AudioBins) {
      mean(j) = if (cnt(j) == 0) 0L else sum(j) * AudioMeanScale / cnt(j)
      j += 1
    }
    dctSignBits63(mean)
  }

  /** [[audioFingerprint]] over an encoded payload: `None` for
    * non-audio, null, or empty payloads (quarantine, not failure).
    * Stateless — streaming-legal.
    */
  def audioHash64(kind: String, content: Array[Byte]): Option[Long] = {
    if (kind != "audio" || content == null) None
    else {
      val samples = decodePcm(content)
      if (samples.isEmpty) None else Some(audioFingerprint(samples))
    }
  }

  /** Per-clip envelope amplitude of the [[nearDupAudio]] fixture, bin
    * `j` of clip `base`: a two-stage integer hash
    * `x = (base·(j+1)·7919 + j·104729) mod 4093`, then
    * `(x·1299709 + base·31) mod 251 + 2` ∈ [2, 252]. Both stages are
    * load-bearing ([[vxR]]-class lessons, each measured at 400 bases):
    * any formula AFFINE in (base, j) gives some foreign base pair a
    * per-bin difference that is CONSTANT, and the sign-of-DCT
    * fingerprint is shift-invariant BY DESIGN, so those pairs hash
    * within 0–2 bits (first cut: cross_min = 0); and the single-mod
    * product form `x` alone is an arithmetic progression in `j`, so
    * base pairs whose slopes differ by ε small drift apart by only
    * ε·(j+1) — a near-DC tilt the signs also ignore (second cut:
    * cross_min = 1, 1455 foreign pairs within Hamming 6). The second
    * multiply-mod layer scrambles that locality: per-bin differences
    * sweep the whole residue range, foreign envelopes are
    * pseudo-independent, and the measured cross distribution sits at
    * the 63/2 binomial mode with cross_min = 16 over every gain×gain
    * pair ([[graft.AudioHashProbe]]) against planted_max = 1.
    */
  def axAmp(base: Long, j: Int): Long = {
    // 4093L, not 4093: floorMod(Long, Int) narrows to Int and the
    // x·1299709 product then overflows Int32 — caught by the stream
    // oracle's raw-fingerprint compare (the Hamming-only batch query
    // cannot see a consistent re-hash of the envelope)
    val x = Math.floorMod(base * (j + 1) * 7919 + j.toLong * 104729, 4093L)
    Math.floorMod(x * 1299709 + base * 31, 251L) + 2
  }

  /** Pseudo-noise magnitude of sample `i` of clip `base`: uniform-ish
    * in [0, 4096). */
  def axMag(base: Long, i: Int): Long =
    Math.floorMod(base * 7919 + i.toLong * 104729, 4096)

  /** Sample count of the [[nearDupAudio]] fixture clips: 64 ms at
    * 16 kHz, 16 samples per envelope bin (1024/[[AudioBins]] exactly,
    * so the oracle's bin arithmetic is `i // 16`). */
  val AudioFixtureSamples = 1024

  /** s16le PCM of the fixture formula with a per-replica integer
    * amplitude GAIN: sample `i` is
    * `((axMag·axAmp / 64) · num) / den` (exact truncating division
    * on nonnegative values — replayable in any engine). Max value
    * 4095·252/64·5/4 = 20155 < 2^15, so no clamping ever fires:
    * gains are pure positive scalings whose only fingerprint
    * distortion is the per-sample floor — the audio analog of
    * [[encodePngContrast]]'s jitter.
    *
    * Replicas additionally BOOST the first 8 envelope bins by `boost`
    * per sample (a bin-local loudness nudge — NOT a DC shift, so it
    * does move AC coefficient signs): pure gains alone leave all five
    * replicas hash-IDENTICAL (measured planted_max = 0 — exact
    * fingerprint dedup would pass the fixture, the
    * [[encodeVideoJitter]] lesson), while the boost pushes replica
    * pairs to small nonzero distances the near-dup path must bridge.
    */
  def encodePcmGain(base: Long, num: Int, den: Int,
      n: Int = AudioFixtureSamples, boost: Int = 0): Array[Byte] = {
    val out = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val j = (i.toLong * AudioBins / n).toInt
      val m = axMag(base, i) * axAmp(base, j) / 64
      val s = (m * num / den + (if (j < 8) boost else 0)).toInt
      out(2 * i) = (s & 0xff).toByte
      out(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  /** Per-replica-step boost of the [[nearDupAudio]] fixture (replica
    * `gi` boosts its first 8 bins by `AudioBoost · gi` per sample):
    * sized by [[graft.AudioHashProbe]] so planted pairs land at small
    * NONZERO fingerprint distances (exact-fp dedup must fail) while
    * staying far under the cross-base floor. */
  val AudioBoost = 16

  /** Near-dup AUDIO fixture over the documents table (the
    * [[nearDupImages]] grouping on the audio-kind ids): the audio ids
    * (`doc_id % 3 = 1`) form groups of five consecutive audio ids
    * (`base = doc_id − doc_id mod 15 + 1`) sharing ONE base clip; each
    * replica re-encodes it under its own integer amplitude gain
    * ([[ContrastGains]], index `(doc_id mod 15 − 1) / 3` ∈ 0..4) —
    * five perceptually near-identical PCM payloads with
    * pairwise-distinct bytes, so exact dedup finds nothing and the
    * envelope fingerprint must.
    */
  def nearDupAudio(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.filter(col("doc_id") % 3 === 1)
      .select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val base = id - id % 15 + 1
          val gi = ((id % 15 - 1) / 3).toInt
          val (num, den) = ContrastGains(gi)
          MediaRow(id, "audio",
            encodePcmGain(base, num, den, boost = AudioBoost * gi),
            0, 0, 16000, 0)
        }
      }
  }

  /** Frame-count ceiling for [[frameHashes]]'s composite frame id
    * (`media_id · MaxHashFrames + frame_idx` must round-trip): 4096
    * frames ≈ 2¼ min at 30 fps of KEY frames. Longer clips are NOT a
    * job killer: [[frameHashes]] stride-samples them down to the cap
    * deterministically (see there) — callers that want every frame of
    * a long clip pre-split it instead.
    */
  val MaxHashFrames = 4096

  /** Per-frame [[pHashImage]] fingerprints of the video-kind rows:
    * `(fid, media_id, fp)`, one row per KEPT decoded frame, where
    * `fid = media_id · MaxHashFrames + frame_ordinal` (a single Long so
    * the pigeonhole pair machinery — which carries Long ids through
    * its bounded min-k state — applies unchanged; decode back with
    * div/mod). Batched `mapPartitions` like every decode stage;
    * null/undecodable payloads yield zero rows (quarantine — one
    * poison row in a crawl batch must not kill the stage). Non-video
    * rows are filtered OUT — image-kind fingerprints belong to
    * [[pHash64]]'s single-frame path.
    *
    * Oversized clips (> [[MaxHashFrames]] decoded frames) are
    * stride-sampled down to the cap instead of failing the job:
    * `stride = ceil(frames / MaxHashFrames)`, keeping frame indices
    * `0, stride, 2·stride, …` — deterministic in the payload alone, so
    * retries/speculation and a differential oracle replay the same
    * kept set. The ordinal of a kept frame (its rank among kept
    * frames, < MaxHashFrames by construction) feeds the composite id.
    * A near-dup verdict needs SOME matching frame pair, not all, so
    * sampling trades recall on sub-second overlaps for a bounded
    * per-clip cost — the audited-drop convention, not a `require`.
    */
  def frameHashes(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").mapPartitions { it =>
      it.grouped(BatchSize).flatMap(_.flatMap { m =>
        val frames =
          if (m.content == null) Seq.empty else decodeVideoFrames(m.content)
        val stride =
          if (frames.size <= MaxHashFrames) 1
          else (frames.size + MaxHashFrames - 1) / MaxHashFrames
        frames.zipWithIndex.collect {
          case (img, f) if f % stride == 0 =>
            (m.media_id * MaxHashFrames + f / stride, m.media_id,
              pHashImage(img))
        }
      })
    }.toDF("fid", "media_id", "fp")
  }

  /** Image dimensions of the synthesized test fixtures. */
  val ImgW = 32
  val ImgH = 32
  /** Frame dimensions of the [[nearDupVideos]] fixture: full 32x32
    * formula frames (the 8x8 [[fromDocuments]] key frames are one
    * pixel per pHash grid cell -- too little luminance surface for the
    * sign bits to separate foreign clips; measured by
    * [[graft.VideoHashProbe]]).
    */
  val VideoW = 32
  val VideoH = 32
  /** Video key frames are small (8×8) so a 30-frame payload stays a few
    * KB.
    */
  val FrameW = 8
  val FrameH = 8

  /** Build a synthetic media table from the documents table — the
    * testdata has no binary column, so payloads are ENCODED here (real
    * PNG / PCM / framed-PNG bytes of the formula pixels, in the
    * executors via `mapPartitions`) and the decode stages read them back
    * through the real codecs. Deterministic in `doc_id`, so the oracle
    * can recompute every decoded feature arithmetically.
    */
  def fromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    val base = docs.select(
      col("doc_id").as("media_id"),
      // deterministic kind mix: image/audio/video by id mod 3
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      (col("n_chars") % 30 + 1).cast("int").as("n_frames"),
      // audio length: 64..263 samples, deterministic in n_chars
      (col("n_chars") % 200 + 64).cast("int").as("n_samples"))
      .as[(Long, String, Int, Int)]
    base.mapPartitions { it =>
      it.map { case (id, kind, nFrames, nSamples) =>
        kind match {
          case "image" =>
            MediaRow(id, kind, encodePng(id, 0, ImgW, ImgH),
              ImgW, ImgH, 0, nFrames)
          case "audio" =>
            MediaRow(id, kind, encodePcm(id, nSamples), 0, 0, 16000, nFrames)
          case _ =>
            MediaRow(id, kind, encodeVideo(id, nFrames, FrameW, FrameH),
              FrameW, FrameH, 0, nFrames)
        }
      }
    }
  }
}
