package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** MVT encoder round-trip + wire-format checks (spec: MVT v2.1). */
class MvtCodecSpec extends AnyFunSuite {

  test("single point feature round-trips with users/trips attributes") {
    val bytes = MvtCodec.encodeTile(Seq(MvtCodec.PixelFeature(10, 20, 5, 99)), 512)
    val feats = MvtCodec.decodeTile(bytes)
    assert(feats === Seq((80L, 160L, 5L, 99L))) // extent scale = 4096/512 = 8
  }

  test("many features, shared value table, preserved order") {
    val in = (0 until 50).map(i => MvtCodec.PixelFeature(i, i * 2, (i % 3).toLong + 1, 7L))
    val feats = MvtCodec.decodeTile(MvtCodec.encodeTile(in, 512))
    assert(feats.size === 50)
    in.zip(feats).foreach { case (f, (x, y, u, t)) =>
      assert(x === f.px * 8L && y === f.py * 8L && u === f.users && t === f.trips)
    }
  }

  test("empty tile encodes (upstream drops empty tiles per Worker.cs:272 semantics)") {
    val bytes = MvtCodec.encodeTile(Nil, 512)
    assert(MvtCodec.decodeTile(bytes).isEmpty)
  }

  test("layer header carries name, version 2, extent 4096") {
    val bytes = MvtCodec.encodeTile(Seq(MvtCodec.PixelFeature(0, 0, 1, 1)), 512)
    val s = new String(bytes.map(b => if (b >= 32 && b < 127) b.toChar else '.'.toChar))
    assert(s.contains("heatmap"))
    assert(s.contains("users") && s.contains("trips"))
  }

  test("streaming encodeTilePoints is byte-identical to encodeTileExtent") {
    val rnd = new java.util.Random(20260817L)
    (0 until 40).foreach { trial =>
      val n = 1 + rnd.nextInt(300)
      val ex = new Array[Long](n); val ey = new Array[Long](n)
      val us = new Array[Long](n); val tr = new Array[Long](n)
      (0 until n).foreach { i =>
        ex(i) = rnd.nextInt(4097).toLong
        ey(i) = rnd.nextInt(4097).toLong
        // values across varint width boundaries + deliberate duplicates
        us(i) = Seq(1L, 7L, 127L, 128L, 300L, 16383L, 16384L,
          rnd.nextInt(1 << 20).toLong)(rnd.nextInt(8))
        tr(i) = Seq(1L, 2L, 255L, 999L, 1L << 33, rnd.nextInt(1 << 24).toLong)(rnd.nextInt(6))
      }
      val old = MvtCodec.encodeTileExtent(
        (0 until n).map(i => MvtCodec.ExtentFeature(ex(i), ey(i), us(i), tr(i))))
      val neo = MvtCodec.encodeTilePoints(n, ex, ey, us, tr)
      assert(neo.toSeq === old.toSeq, s"trial $trial n=$n differs")
    }
  }

  test("byte-level golden fixture (hand-derived from the MVT v2.1 spec)") {
    // One Point feature at extent (80, 160) with users=5, trips=99. Every
    // byte below was derived BY HAND from the published protobuf wire format
    // + vector_tile.proto field numbers (github.com/mapbox/vector-tile-spec),
    // independently of the encoder under test:
    //   tile: field3 len-delim (layer, 53 bytes)
    //   layer: version(15)=2, name(1)="heatmap", feature(2):
    //     tags(2)=[0,0,1,1], type(3)=POINT,
    //     geom(4)=[MoveTo(1,1), zigzag(80)=160, zigzag(160)=320]
    //   keys(3)="users","trips"; values(4)={uint(5)}, {uint(99)}; extent(5)=4096
    val golden = Array(
      0x1A, 0x35,
      0x78, 0x02,
      0x0A, 0x07, 'h', 'e', 'a', 't', 'm', 'a', 'p',
      0x12, 0x0F,
      0x12, 0x04, 0x00, 0x00, 0x01, 0x01,
      0x18, 0x01,
      0x22, 0x05, 0x09, 0xA0, 0x01, 0xC0, 0x02,
      0x1A, 0x05, 'u', 's', 'e', 'r', 's',
      0x1A, 0x05, 't', 'r', 'i', 'p', 's',
      0x22, 0x02, 0x28, 0x05,
      0x22, 0x02, 0x28, 0x63,
      0x28, 0x80, 0x20).map(_.toByte)
    val got = MvtCodec.encodeTileExtent(Seq(MvtCodec.ExtentFeature(80, 160, 5, 99)))
    assert(got.toSeq === golden.toSeq)
  }

  test("delta-encoded multi-point geometry cursor round-trips (G8)") {
    val pts = Seq((100L, 200L), (104L, 196L), (104L, 196L), (0L, 4095L))
    val enc = MvtCodec.encodeMultiPointGeom(pts)
    assert(MvtCodec.decodeMultiPointGeom(enc) === pts)
    // command integer: MoveTo (id 1) with count 4 → (4 << 3) | 1 = 0x21
    assert((enc(0) & 0xFF) === 0x21)
    // single-point case is the layer encoder's n=1 form: MoveTo count 1 = 0x09
    val one = MvtCodec.encodeMultiPointGeom(Seq((80L, 160L)))
    assert((one(0) & 0xFF) === 0x09)
    assert(MvtCodec.decodeMultiPointGeom(one) === Seq((80L, 160L)))
    // deltas actually shrink the wire size vs absolute re-encoding
    val walk = (0 until 50).map(i => (1000L + i, 2000L + i))
    assert(MvtCodec.encodeMultiPointGeom(walk).length < 1 + 50 * 4)
  }

  test("TilePlacer memoization == naive per-pixel formula (independent re-derivation)") {
    // the unhoisted two-step transform, re-written here from the same
    // public formulas — guards the per-axis caching against drift
    def naive(z: Int, tx: Long, ty: Long, px: Int, py: Int, res: Int, extent: Int): (Long, Long) = {
      val (left, top, right, bottom) = graft.core.Slippy.boxXY(z, tx, ty)
      val lon = left + ((right - left) / res) * px
      val lat = top - (py * ((top - bottom) / res))
      def mx(l: Double) = l * graft.core.WebMercator.OriginShift / 180.0
      def my(l: Double) =
        math.log(math.tan((90.0 + l) * math.Pi / 360.0)) / (math.Pi / 180.0) *
          graft.core.WebMercator.OriginShift / 180.0
      val r = graft.core.WebMercator.resolution(z, extent)
      (((mx(lon) - mx(left)) / r).toLong, ((my(top) - my(lat)) / r).toLong)
    }
    val rnd = new java.util.Random(5)
    (1 to 300).foreach { _ =>
      val z = 6 + rnd.nextInt(9)
      val tx = rnd.nextInt(1 << z).toLong
      val ty = 1 + rnd.nextInt((1 << z) - 2).toLong
      val px = rnd.nextInt(512); val py = rnd.nextInt(512)
      val got = graft.core.WebMercator.extentCoords(z, tx, ty, px, py, 512, MvtCodec.Extent)
      // twice through the SAME placer exercises the cached path too
      val placer = graft.core.WebMercator.placer(z, tx, ty, 512, MvtCodec.Extent)
      placer.ex(px); placer.ey(py)
      assert((placer.ex(px), placer.ey(py)) === got)
      assert(got === naive(z, tx, ty, px, py, 512, MvtCodec.Extent), s"($z,$tx,$ty,$px,$py)")
    }
  }

  test("mercator placement: x sub-unit off linear, y sub-pixel off linear, 0 at tile top") {
    val res = 512
    // Brussels-area z14 tile + a far-north tile (worst-case Mercator stretch)
    for ((z, tx, ty) <- Seq((14, 8389L, 5488L), (14, 8389L, 2500L), (8, 131L, 85L))) {
      for (px <- Seq(0, 1, 100, 255, 511); py <- Seq(0, 1, 100, 255, 511)) {
        val (ex, ey) = graft.core.WebMercator.extentCoords(z, tx, ty, px, py, res, MvtCodec.Extent)
        // x is mathematically linear; fp truncation ((int) cast in the
        // external writer, reproduced here) may knock it one unit down
        assert(math.abs(ex - px.toLong * 8) <= 1, s"x at ($px,$py): $ex")
        // at z14 the tile lat-span is tiny → divergence stays sub-pixel;
        // low-zoom tiles span degrees of latitude, so the linear-vs-mercator
        // gap legitimately grows to a few pixels (reference behavior too)
        val dy = math.abs(ey - py.toLong * 8)
        val bound = if (z >= 14) 8 else 32
        assert(dy < bound, s"y divergence $dy ≥ $bound at ($px,$py) of ($z,$tx,$ty)")
        if (px == 0) assert(ex === 0L, "tile left edge must map to extent 0")
        if (py == 0) assert(ey === 0L, "tile top edge must map to extent 0")
      }
    }
  }
}
