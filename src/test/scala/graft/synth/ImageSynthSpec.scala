package graft.synth

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Slippy

/**
 * Image-payload invariants (BASELINE.json input_hint / SURVEY.md §5.5):
 * PNG bit-exact, JPEG PSNR ≥ 40 dB vs the deterministic reference pixels,
 * captions byte-equal, everything reproducible from the row index alone.
 */
class ImageSynthSpec extends AnyFunSuite {

  test("synthesis is deterministic: same index → identical bytes and caption") {
    (0L to 20L).foreach { i =>
      val a = ImageSynth.row(i); val b = ImageSynth.row(i)
      assert(a.bytes.toSeq === b.bytes.toSeq)
      assert(a.caption === b.caption)
      assert(a.phash === b.phash)
    }
  }

  test("png rows decode bit-exact vs reference pixels") {
    (0L to 30L by 2).foreach { i =>
      val r = ImageSynth.row(i)
      assert(r.fmt === "png")
      val img = ImageSynth.decode(r.bytes)
      assert(img.getWidth === r.w && img.getHeight === r.h)
      var y = 0
      while (y < r.h) {
        var x = 0
        while (x < r.w) {
          assert((img.getRGB(x, y) & 0xFFFFFF) === ImageSynth.refPixel(r.phash, r.w, r.h, x, y))
          x += 1
        }
        y += 1
      }
    }
  }

  test("jpg rows decode with PSNR >= 40 dB vs reference pixels") {
    (1L to 31L by 2).foreach { i =>
      val r = ImageSynth.row(i)
      assert(r.fmt === "jpg")
      val img = ImageSynth.decode(r.bytes)
      assert(img.getWidth === r.w && img.getHeight === r.h)
      val p = ImageSynth.psnr(img, r.phash, r.w, r.h)
      assert(p >= 40.0, s"row $i psnr $p < 40")
    }
  }

  test("captions are deterministic templates carrying the image id") {
    (0L to 50L).foreach { i =>
      val c = ImageSynth.captionOf(i)
      assert(c.contains(ImageSynth.imageId(i)))
      assert(c === ImageSynth.captionOf(i))
    }
  }

  test("derived traces: k in [2,64], deterministic, clustered near a center") {
    (0L to 200L).foreach { i =>
      val ph = ImageSynth.phashOf(i)
      val t1 = TraceSynth.trace(ph); val t2 = TraceSynth.trace(ph)
      assert(t1.length >= 2 && t1.length <= 64)
      assert(t1.map(_.toSeq).toSeq === t2.map(_.toSeq).toSeq)
      val (hlon, hlat) = TraceSynth.hubOf(ph)
      assert(math.abs(t1(0)(0) - hlon) < 0.01)
      assert(math.abs(t1(0)(1) - hlat) < 0.01)
    }
  }

  test("traces produce hot z14 tiles (skew) and >=3 users overlap pixels (k-anonymity live)") {
    val n = 400
    val tracks = (0L until n).map { i =>
      val ph = ImageSynth.phashOf(i)
      (TraceSynth.userOf(ph, 8), TraceSynth.trace(ph))
    }
    // tile histogram of start points
    val tileCounts = tracks.groupBy { case (_, t) =>
      Slippy.worldToTile(t(0)(0), t(0)(1), 14)
    }.view.mapValues(_.size).toMap
    assert(tileCounts.values.max >= n / 20, "expected a hot tile (the 20% core)")
    assert(tileCounts.size >= 20, "expected traces spread over many z14 tiles")
    // at least one pixel with >=3 distinct users
    val byPixel = scala.collection.mutable.Map.empty[(Long, Long), Set[Long]]
    tracks.foreach { case (u, t) =>
      t.foreach { c =>
        Slippy.toHeatMapCoordinates(14, 512, c(0), c(1)).foreach { p =>
          byPixel(p) = byPixel.getOrElse(p, Set.empty) + u
        }
      }
    }
    assert(byPixel.values.exists(_.size >= 3), "expected >=3-user overlap pixels")
  }
}
