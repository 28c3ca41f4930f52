package graft.image

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.HeatmapPipeline
import graft.synth.ImageSynth

/** Multimodal plumbing: real decode/resize correctness; stub ops keep a
  * stable, deterministic contract. */
class ImageOpsSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = graft.spark.Sessions.local(4, "image-spec")

  test("decodeFeatures: per-channel means match a driver-side decode") {
    implicit val s: SparkSession = spark
    val feats = ImageOps.decodeFeatures(HeatmapPipeline.images(24)).collect()
    assert(feats.length === 24)
    feats.foreach { f =>
      val i = f.image_id.stripPrefix("img").toLong
      val img = ImageSynth.decode(ImageSynth.row(i).bytes)
      var sr = 0L; var n = 0L
      (0 until img.getHeight).foreach { y =>
        (0 until img.getWidth).foreach { x => sr += (img.getRGB(x, y) >> 16) & 0xFF; n += 1 }
      }
      assert(math.abs(f.mean_r - sr.toDouble / n) < 1e-9)
      assert(f.w === img.getWidth && f.h === img.getHeight)
    }
  }

  test("resize: thumbnails decode at the target size") {
    implicit val s: SparkSession = spark
    val thumbs = ImageOps.resize(HeatmapPipeline.images(10), 16, 16).collect()
    assert(thumbs.length === 10)
    thumbs.foreach { t =>
      val img = ImageSynth.decode(t.png)
      assert(img.getWidth === 16 && img.getHeight === 16)
    }
  }

  test("stub frame sampling: deterministic, schema-stable, bounded frames") {
    implicit val s: SparkSession = spark
    val media = HeatmapPipeline.images(12).toDF()
    val a = ImageOps.frameSample(media).collect().sortBy(f => (f.media_id, f.frame_idx))
    val b = ImageOps.frameSample(media).collect().sortBy(f => (f.media_id, f.frame_idx))
    assert(a.length === b.length && a.nonEmpty)
    a.zip(b).foreach { case (x, y) =>
      assert(x.media_id === y.media_id && x.frame_idx === y.frame_idx && x.ts_ms === y.ts_ms)
      assert(x.frame.toSeq === y.frame.toSeq)
      assert(x.ts_ms === x.frame_idx * 1000L)
    }
  }

  test("stub audio features: fixed window count, deterministic energies in [0,1]") {
    implicit val s: SparkSession = spark
    val media = HeatmapPipeline.images(8).toDF()
    val feats = ImageOps.audioFeatures(media).collect()
    assert(feats.length === 8)
    feats.foreach { f =>
      assert(f.n_windows === 8 && f.energy.length === 8)
      assert(f.energy.forall(e => e >= 0.0 && e <= 1.0))
    }
  }
}
