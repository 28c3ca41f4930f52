package graft.synth

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

import graft.model.Schemas.ImageRow

/**
 * Deterministic image + caption synthesis for the Iceberg-shaped input table
 * mandated by BASELINE.json `input_hint`:
 * (image_id string, bytes binary, w int, h int, fmt string, caption string,
 * phash int64). Everything derives from the row index — no wall clock, no
 * external data (FIXTURES.md §2).
 *
 * Pixel pattern is a smooth seeded gradient (low spatial frequency ⇒ JPEG
 * round-trips comfortably above the 40 dB PSNR gate; PNG is lossless).
 */
object ImageSynth {

  def imageId(i: Long): String = f"img$i%08d"

  def phashOf(i: Long): Long = TraceSynth.mix64(i ^ 0x5EEDCAFEBABEL)

  /** Deterministic phash corpus WITH planted near-duplicates: images come
    * in groups of 4 sharing a base hash; member v of a group (v = i % 4)
    * has exactly v bits flipped at distinct positions, so every group
    * holds pairs across the hamming spectrum 0-6 while cross-group pairs
    * are ~random 64-bit (hamming ≈ 32). Drives the phash near-dup join
    * and its DuckDB oracle. */
  def plantedPhash(i: Long): Long = {
    val base = phashOf(i >> 2)
    val v = (i & 3).toInt
    var h = base
    var j = 0
    while (j < v) {
      h ^= 1L << (((i * 13 + j * 17) % 64).toInt)
      j += 1
    }
    h
  }

  def fmtOf(i: Long): String = if (i % 2 == 0) "png" else "jpg"

  def dimsOf(i: Long): (Int, Int) = {
    val w = 32 + ((i % 3) * 16).toInt // 32 | 48 | 64
    val h = 32 + (((i / 3) % 3) * 16).toInt
    (w, h)
  }

  def captionOf(i: Long): String = {
    val ph = phashOf(i)
    val subj = Subjects((java.lang.Long.remainderUnsigned(ph, Subjects.length.toLong)).toInt)
    val place = Places((java.lang.Long.remainderUnsigned(ph >>> 17, Places.length.toLong)).toInt)
    s"A photo of $subj near $place (#${imageId(i)})"
  }

  private val Subjects = Array("a red bicycle", "a cargo bike", "a city cyclist",
    "a bike lane", "a mountain bike", "a tandem", "a bike-share dock", "a courier")
  private val Places = Array("the canal", "the market square", "a park",
    "the station", "a bridge", "the old town", "the riverside", "a boulevard")

  /** Reference (pre-encoding) pixel value at (x, y): smooth seeded luma
    * gradient with a CONSTANT per-image tint. Constant chroma keeps the
    * JPEG writer's 4:2:0 subsampling lossless in the chroma planes, so the
    * 40 dB PSNR gate is met by luma quality alone. */
  def refPixel(phash: Long, w: Int, h: Int, x: Int, y: Int): Int = {
    val tintR = ((phash >>> 0) & 0x3F).toInt  // constant offsets, no clamping:
    val tintG = ((phash >>> 8) & 0x3F).toInt  // v in [0,191], tint in [0,63]
    val tintB = ((phash >>> 16) & 0x3F).toInt
    val base = ((phash >>> 24) & 0x3F).toInt
    val v = (base + (x * 67) / math.max(w - 1, 1) + (y * 61) / math.max(h - 1, 1)) % 192
    ((v + tintR) << 16) | ((v + tintG) << 8) | (v + tintB)
  }

  def renderImage(phash: Long, w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, refPixel(phash, w, h, x, y)); x += 1 }
      y += 1
    }
    img
  }

  /** Seeded block-texture image (8-px luma cells, constant tint) — the
    * spatially DIVERSE family the perceptual-hash tests need: the gradient
    * family (`refPixel`) shares one spatial structure across all seeds, so
    * two "different" gradient images genuinely LOOK alike and any honest
    * perceptual hash places them close; distinct texture seeds give
    * uncorrelated low-frequency signatures instead. */
  def renderTextured(seed: Long, w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val cell = (y / 8).toLong * 4096 + (x / 8)
        val v = (TraceSynth.mix64(seed ^ (cell * 0x9E3779B97F4A7C15L)) >>> 40).toInt & 0xFF
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    img
  }

  def encode(img: BufferedImage, fmt: String): Array[Byte] =
    // explicit high quality: default (~0.75) lands near 29 dB on gradients,
    // under the 40 dB PSNR gate; 0.97 clears it with margin
    if (fmt == "jpg") encodeJpeg(img, 0.97f)
    else {
      val out = new ByteArrayOutputStream()
      ImageIO.write(img, "png", out)
      out.toByteArray
    }

  /** JPEG at an explicit quality (lower qualities synthesize the lossy
    * re-encode variants the perceptual-hash gates measure against). */
  def encodeJpeg(img: BufferedImage, quality: Float): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val writer = ImageIO.getImageWritersByFormatName("jpg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality)
    val ios = ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
    writer.dispose()
    ios.close()
    out.toByteArray
  }

  /** Full synthesized row for index i. */
  def row(i: Long): ImageRow = {
    val ph = phashOf(i)
    val (w, h) = dimsOf(i)
    val fmt = fmtOf(i)
    ImageRow(imageId(i), encode(renderImage(ph, w, h), fmt), w, h, fmt, captionOf(i), ph)
  }

  /** Decode an encoded payload back to RGB ints (row-major). */
  def decode(bytes: Array[Byte]): BufferedImage =
    ImageIO.read(new java.io.ByteArrayInputStream(bytes))

  /** PSNR (dB) of decoded vs the deterministic reference pixels. */
  def psnr(decoded: BufferedImage, phash: Long, w: Int, h: Int): Double = {
    var se = 0.0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val got = decoded.getRGB(x, y)
        val ref = refPixel(phash, w, h, x, y)
        var ch = 0
        while (ch < 3) {
          val d = ((got >> (8 * ch)) & 0xFF) - ((ref >> (8 * ch)) & 0xFF)
          se += d.toDouble * d
          ch += 1
        }
        x += 1
      }
      y += 1
    }
    if (se == 0.0) Double.PositiveInfinity
    else {
      val mse = se / (w.toLong * h * 3)
      10.0 * math.log10(255.0 * 255.0 / mse)
    }
  }
}
