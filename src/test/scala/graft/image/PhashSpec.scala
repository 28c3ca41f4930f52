package graft.image

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup.hamming
import graft.image.ImageOps.phash64
import graft.model.Schemas.ImageRow
import graft.synth.ImageSynth

/** The in-engine DCT perceptual hash: re-encode invariance, separation of
  * distinct content, and the end-to-end bytes→phash→hamming-join dedup. */
class PhashSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = graft.spark.Sessions.local(4, "phash-spec")

  private def tex(seed: Long) = ImageSynth.renderTextured(seed, 48, 48)
  private def ph(bytes: Array[Byte]): Long = phash64(ImageSynth.decode(bytes))

  test("deterministic; invariant under PNG <-> high-quality JPEG re-encode") {
    (0 until 20).foreach { i =>
      val img = tex(i * 7919L)
      val png = ph(ImageSynth.encode(img, "png"))
      assert(png === ph(ImageSynth.encode(img, "png")), "non-deterministic")
      assert(hamming(png, ph(ImageSynth.encode(img, "jpg"))) <= 2, s"seed $i drifted")
    }
  }

  test("robust to harsh lossy re-encode (JPEG q=0.1) within the dedup cutoff") {
    (0 until 20).foreach { i =>
      val img = tex(i * 7919L)
      val d = hamming(ph(ImageSynth.encode(img, "png")), ph(ImageSynth.encodeJpeg(img, 0.1f)))
      assert(d <= 6, s"seed $i q=0.1 hamming $d above cutoff")
    }
  }

  test("spatially distinct content separates far beyond the cutoff") {
    val hs = (0 until 20).map(i => ph(ImageSynth.encode(tex(i * 104729L + 13), "png")))
    for (i <- hs.indices; j <- i + 1 until hs.size)
      assert(hamming(hs(i), hs(j)) >= 10, s"pair $i,$j too close: ${hamming(hs(i), hs(j))}")
  }

  test("the gradient synth family is PERCEPTUALLY one image — hashes collapse (why renderTextured exists)") {
    val hs = (0 until 10).map(i => ph(ImageSynth.encode(
      ImageSynth.renderImage(ImageSynth.phashOf(i), 48, 48), "png")))
    assert(hs.distinct.size <= 2, s"gradient family unexpectedly diverse: ${hs.distinct.size}")
  }

  test("pooled-luma embedding: deterministic; re-encode probe retrieves its original as top hit") {
    implicit val s: SparkSession = spark
    import s.implicits._
    val imgs = (0L until 30L).map { i =>
      ImageRow(f"simg$i%05d", ImageSynth.encode(tex(i * 15731L + 7), "png"), 48, 48, "png", "", 0L)
    } :+ ImageRow("qry00000", ImageSynth.encodeJpeg(tex(7L), 0.3f), 48, 48, "jpg", "", 0L)
    val emb = ImageOps.computeEmbeddings(s.createDataset(imgs))
      .map(e => (if (e.image_id.startsWith("simg")) e.image_id.drop(4).toLong else -1L,
        e.embedding)).toDF("vec_id", "embedding")
    val top = graft.ann.Ann.bruteForceTopK(emb, queryVecId = -1L, k = 3)
      .as[(Long, Double)].collect()
    // the probe re-encodes seed 7 = original 0's seed (0*15731 + 7)
    assert(top.head._1 === 0L, s"probe must retrieve its original first: ${top.toSeq}")
    assert(top.head._2 > 0.999, s"re-encode cosine too low: ${top.head._2}")
    assert(top(1)._2 < top.head._2 - 0.001, "next hit must be clearly separated")
    // determinism
    val v1 = ImageOps.pooledLumaVec(ImageSynth.decode(imgs.head.bytes))
    val v2 = ImageOps.pooledLumaVec(ImageSynth.decode(imgs.head.bytes))
    assert(v1.toSeq === v2.toSeq)
    assert(v1.length === 64)
  }

  test("end-to-end: bytes -> computePhashes -> phashNearDups finds exactly the planted re-encodes") {
    implicit val s: SparkSession = spark
    import s.implicits._
    val originals = (0L until 30L).map { i =>
      ImageRow(f"orig$i%05d", ImageSynth.encode(tex(i * 7919L), "png"), 48, 48, "png", "", 0L)
    }
    val variants = (0L until 10L).map { i =>
      ImageRow(f"vrnt$i%05d", ImageSynth.encodeJpeg(tex(i * 7919L), 0.3f), 48, 48, "jpg", "", 0L)
    }
    val hashes = ImageOps.computePhashes(s.createDataset(originals ++ variants))
      .map(p => (if (p.image_id.startsWith("orig")) p.image_id.drop(4).toLong
                 else 1000L + p.image_id.drop(4).toLong, p.phash))
      .toDF("id", "phash")
    val pairs = graft.dedup.Dedup.phashNearDups(hashes, maxDist = 6)
      .as[(Long, Long, Long)].collect().map(p => (p._1, p._2)).toSet
    val want = (0L until 10L).map(i => (i, 1000L + i)).toSet
    assert(pairs === want, s"missing=${want -- pairs} extra=${pairs -- want}")
  }
}
