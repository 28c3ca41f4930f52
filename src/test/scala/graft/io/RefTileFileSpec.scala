package graft.io

import org.scalatest.funsuite.AnyFunSuite

/** S7 fixed-width codec: the reference's block tile-file format. */
class RefTileFileSpec extends AnyFunSuite {

  test("write → read round-trips non-zero cells (block-walk order)") {
    val cells = Seq((0, 0, 5L), (0, 63, 7L), (1, 0, 9L), (511, 511, 0xFFFFFFFFL),
      (300, 17, graft.core.Codec.encode(3, 12)))
    val bytes = RefTileFile.write(512, cells)
    val (res, got) = RefTileFile.read(bytes)
    assert(res === 512)
    assert(got.toSet === cells.toSet)
    // reference enumeration order: ascending pos = x*res + y
    assert(got.map { case (x, y, _) => x * 512 + y } === got.map { case (x, y, _) => x * 512 + y }.sorted)
  }

  test("reader decodes a hand-built file (format spec, independent of the writer)") {
    // res=8 → 64 pixels = exactly 1 block; header 4B + 1 pointer + 64 u64s
    val res = 8
    val bytes = new Array[Byte](4 + 4 + 64 * 8)
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(0, res)
    bb.putInt(4, 0) // block 0 at heap element 0
    // pixel (2, 3): pos = 2*8+3 = 19 → heap slot 19
    bb.putLong(8 + 19 * 8, 42L)
    // pixel (7, 7): pos = 63 → slot 63
    bb.putLong(8 + 63 * 8, (9L << 32) | 4L)
    val (gotRes, cells) = RefTileFile.read(bytes)
    assert(gotRes === res)
    assert(cells === Seq((2, 3, 42L), (7, 7, (9L << 32) | 4L)))
    // and the packed payload splits per Encoder.cs
    assert(graft.core.Codec.decode(cells(1)._3) === ((9L, 4L)))
  }

  test("append grows the heap in place: old blocks copied, new blocks at the tail (S9)") {
    val base = RefTileFile.write(64, Seq((0, 0, 5L), (10, 10, 7L)))
    // one cell into an EXISTING block (pos 1 shares block 0) + one new block
    val appended = RefTileFile.append(base, Seq((0, 1, 9L), (63, 63, 11L)))
    val (_, got) = RefTileFile.read(appended)
    assert(got.toSet === Set((0, 0, 5L), (0, 1, 9L), (10, 10, 7L), (63, 63, 11L)))
    // equal to the read-merge-rewrite form
    val rewritten = RefTileFile.write(64, got)
    assert(RefTileFile.read(rewritten)._2.toSet === got.toSet)
    // only the heap tail grew: header + pointers region size unchanged
    assert(appended.length === base.length + 64 * 8)
  }

  test("empty-pointer blocks and a truncated heap are handled safely") {
    val bytes = RefTileFile.write(64, Seq((5, 5, 1L)))
    val truncated = bytes.take(bytes.length - 8) // chop the heap tail
    val (_, cells) = RefTileFile.read(truncated)
    assert(cells.forall(_._3 != 0L)) // no phantom values from the cut region
  }
}
