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
}
