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

  /** Real resize to a thumbnail (PNG), batched per partition. */
  def resize(images: Dataset[ImageRow], targetW: Int = 16, targetH: Int = 16)(
      implicit spark: SparkSession): Dataset[Thumbnail] = {
    import spark.implicits._
    images.mapPartitions { batch =>
      batch.map { r =>
        val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.bytes))
        val dst = new BufferedImage(targetW, targetH, BufferedImage.TYPE_INT_RGB)
        val g = dst.createGraphics()
        g.drawImage(src.getScaledInstance(targetW, targetH, java.awt.Image.SCALE_AREA_AVERAGING), 0, 0, null)
        g.dispose()
        val out = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(dst, "png", out)
        Thumbnail(r.image_id, targetW, targetH, out.toByteArray)
      }
    }
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
        val n = 1 + (math.abs(seed) % maxFrames).toInt
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
