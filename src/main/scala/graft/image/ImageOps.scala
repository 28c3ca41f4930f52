package graft.image

import java.awt.image.BufferedImage

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.model.Schemas.ImageRow
import graft.synth.TraceSynth.mix64

/**
 * Multimodal column operators: image/audio/video as opaque binary columns
 * with typed metadata, processed in PARTITION BATCHES (the Scala analog of
 * `mapInPandas` — one decode context per partition, vectorized-shaped
 * iteration, no per-row UDF dispatch).
 *
 * Image decode/resize are REAL (javax.imageio ships with the JDK). Video
 * frame-sampling and audio feature extraction are STUBS — the codec
 * libraries are not in this container — marked `STUB:` below: they produce
 * deterministic fake payloads while keeping the Spark-side contract (schema,
 * batch shape, partitioning) real and tested, so swapping in a real codec
 * is a one-function change.
 */
object ImageOps {

  final case class ImageFeatures(
      image_id: String, w: Int, h: Int, fmt: String,
      mean_r: Double, mean_g: Double, mean_b: Double)

  final case class Thumbnail(image_id: String, w: Int, h: Int, png: Array[Byte])

  final case class FrameSample(media_id: String, frame_idx: Int, ts_ms: Long, frame: Array[Byte])

  final case class AudioFeatures(media_id: String, n_windows: Int, energy: Array[Double])

  /** Real decode + per-channel mean features, batched per partition. */
  def decodeFeatures(images: Dataset[ImageRow])(implicit spark: SparkSession): Dataset[ImageFeatures] = {
    import spark.implicits._
    images.mapPartitions { batch =>
      batch.map { r =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.bytes))
        var sr = 0L; var sg = 0L; var sb = 0L
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val p = img.getRGB(x, y)
            sr += (p >> 16) & 0xFF; sg += (p >> 8) & 0xFF; sb += p & 0xFF
            x += 1
          }
          y += 1
        }
        val n = img.getWidth.toLong * img.getHeight
        ImageFeatures(r.image_id, r.w, r.h, r.fmt, sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
      }
    }
  }

  /** Quadrant RGB means of a decoded image (pure kernel, shared by the
    * q_img_features query and its driver-side VALUES oracle). */
  def quadrantMeans(img: BufferedImage, w: Int, h: Int): (Double, Double, Double, Double) = {
    def mean(x0: Int, y0: Int, x1: Int, y1: Int): Double = {
      var sum = 0L; var cnt = 0L
      var y = y0
      while (y < y1) {
        var x = x0
        while (x < x1) {
          val rgb = img.getRGB(x, y)
          sum += ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)
          cnt += 3; x += 1
        }
        y += 1
      }
      if (cnt == 0) 0.0 else sum.toDouble / cnt
    }
    (mean(0, 0, w / 2, h / 2), mean(w / 2, 0, w, h / 2),
      mean(0, h / 2, w / 2, h), mean(w / 2, h / 2, w, h))
  }

  /** Pure per-row thumbnail kernel (also the driver-side oracle's
    * recomputation path — deterministic for a given JDK). */
  def thumbnailOf(r: ImageRow, targetW: Int, targetH: Int): Thumbnail = {
    val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.bytes))
    val dst = new BufferedImage(targetW, targetH, BufferedImage.TYPE_INT_RGB)
    val g = dst.createGraphics()
    g.drawImage(src.getScaledInstance(targetW, targetH, java.awt.Image.SCALE_AREA_AVERAGING), 0, 0, null)
    g.dispose()
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(dst, "png", out)
    Thumbnail(r.image_id, targetW, targetH, out.toByteArray)
  }

  /** Real resize to a thumbnail (PNG), batched per partition. */
  def resize(images: Dataset[ImageRow], targetW: Int = 16, targetH: Int = 16)(
      implicit spark: SparkSession): Dataset[Thumbnail] = {
    import spark.implicits._
    images.mapPartitions(batch => batch.map(r => thumbnailOf(r, targetW, targetH)))
  }

  /** DCT perceptual hash (pHash) of decoded pixels — REAL, pure-JDK: the
    * engine computes the fingerprint the hamming dedup joins consume,
    * rather than trusting the input table's `phash` column. Pipeline:
    * luma (BT.601) area-binned to 32×32 → 2-D DCT-II → top-left 8×8
    * low-frequency block → bit i set iff coefficient i exceeds the mean of
    * the 63 AC coefficients (DC's bit is ~always set; a constant bit is
    * harmless for DISTANCES, which is all hamming dedup uses). Robust to
    * re-encoding (PNG↔high-quality JPEG moves low-freq luma barely) and
    * far apart for spatially distinct content — both gated in PhashSpec. */
  /** cos((2a+1)·u·π/64) for the 32-point DCT-II, u < 8 — hoisted: the
    * kernel runs per image row, 64×1024 products each. */
  private val DctCos: Array[Array[Double]] =
    Array.tabulate(8, 32)((u, a) => math.cos((2 * a + 1) * u * math.Pi / 64))

  /** n×n area-binned BT.601 luma grid of a decoded image — the shared
    * front end of the perceptual hash (n=32) and the pooled-luma
    * embedding (n=8). */
  def lumaGrid(img: BufferedImage, n: Int): Array[Array[Double]] = {
    val w = img.getWidth
    val h = img.getHeight
    val sum = Array.ofDim[Double](n, n)
    val cnt = Array.ofDim[Int](n, n)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        val luma = 0.299 * ((p >> 16) & 0xFF) + 0.587 * ((p >> 8) & 0xFF) + 0.114 * (p & 0xFF)
        sum(y * n / h)(x * n / w) += luma
        cnt(y * n / h)(x * n / w) += 1
        x += 1
      }
      y += 1
    }
    val g = Array.ofDim[Double](n, n)
    var i = 0
    while (i < n) {
      var j = 0
      while (j < n) { if (cnt(i)(j) > 0) g(i)(j) = sum(i)(j) / cnt(i)(j); j += 1 }
      i += 1
    }
    g
  }

  /** Flat n²-dim pooled-luma embedding — the deterministic in-engine
    * feature vector for image similarity search (ANN over images without
    * an external model; swap in a real encoder at the same signature). */
  def pooledLumaVec(img: BufferedImage, n: Int = 8): Array[Double] =
    lumaGrid(img, n).flatten

  def phash64(img: BufferedImage): Long = {
    val N = 32
    val g = lumaGrid(img, N)
    val coeff = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0
        var a = 0
        while (a < N) {
          var b = 0
          while (b < N) {
            s += g(a)(b) * DctCos(u)(a) * DctCos(v)(b)
            b += 1
          }
          a += 1
        }
        coeff(u * 8 + v) = s
        v += 1
      }
      u += 1
    }
    val acMean = (coeff.sum - coeff(0)) / 63.0
    var bits = 0L
    var k = 0
    while (k < 64) {
      if (coeff(k) > acMean) bits |= 1L << k
      k += 1
    }
    bits
  }

  final case class ImagePhash(image_id: String, phash: Long)

  final case class ImageEmbedding(image_id: String, embedding: Array[Double])

  /** Batched bytes → pooled-luma embedding (the front half of image
    * similarity search: computeEmbeddings ∘ Ann.bruteForceTopK / IVF). */
  def computeEmbeddings(images: Dataset[ImageRow], n: Int = 8)(
      implicit spark: SparkSession): Dataset[ImageEmbedding] = {
    import spark.implicits._
    images.mapPartitions { batch =>
      batch.map { r =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.bytes))
        ImageEmbedding(r.image_id, pooledLumaVec(img, n))
      }
    }
  }

  /** Batched bytes → perceptual hash (the front half of the end-to-end
    * image dedup pipeline: computePhashes ∘ Dedup.phashNearDups). */
  def computePhashes(images: Dataset[ImageRow])(
      implicit spark: SparkSession): Dataset[ImagePhash] = {
    import spark.implicits._
    images.mapPartitions { batch =>
      batch.map { r =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.bytes))
        ImagePhash(r.image_id, phash64(img))
      }
    }
  }

  /** STUB frame count for one media payload (deterministic; exposed so the
    * driver-side oracle can recompute the expectation). */
  def stubFrameCount(id: String, nBytes: Int, maxFrames: Int = 4): Int = {
    val seed = mix64(nBytes.toLong ^ id.hashCode.toLong)
    1 + (math.abs(seed) % maxFrames).toInt
  }

  /** STUB: video frame sampling. A real implementation would open the
    * container (e.g. via a JNI codec) once per partition and demux
    * keyframes; the stub derives deterministic fake frames from the byte
    * payload so schema, batch shape and timing columns are exercised. */
  def frameSample(media: DataFrame, everyMs: Long = 1000L, maxFrames: Int = 4)(
      implicit spark: SparkSession): Dataset[FrameSample] = {
    import spark.implicits._
    media.select("image_id", "bytes").as[(String, Array[Byte])].mapPartitions { batch =>
      // one "decoder" per partition — the mapInPandas-like batch boundary
      batch.flatMap { case (id, bytes) =>
        val seed = mix64(bytes.length.toLong ^ id.hashCode.toLong)
        val n = stubFrameCount(id, bytes.length, maxFrames)
        (0 until n).iterator.map { i =>
          val fakeFrame = Array.tabulate[Byte](16)(j => (mix64(seed + i * 97 + j) & 0xFF).toByte)
          FrameSample(id, i, i * everyMs, fakeFrame)
        }
      }
    }
  }

  /** STUB: audio energy windows. Real impl = PCM decode + RMS per window;
    * the stub computes deterministic pseudo-energies from the payload. */
  def audioFeatures(media: DataFrame, windows: Int = 8)(
      implicit spark: SparkSession): Dataset[AudioFeatures] = {
    import spark.implicits._
    media.select("image_id", "bytes").as[(String, Array[Byte])].mapPartitions { batch =>
      batch.map { case (id, bytes) =>
        val seed = mix64(bytes.length.toLong ^ id.hashCode.toLong)
        AudioFeatures(id, windows,
          Array.tabulate(windows)(i => ((mix64(seed + i) >>> 12).toDouble / (1L << 52)).abs))
      }
    }
  }
}
