package graft.io

import java.nio.{ByteBuffer, ByteOrder}

/**
 * Reader/writer for the REFERENCE's on-disk tile format (S7, the
 * fixed-width codec) — the mmap'd block file of
 * `/root/reference/src/HeatMap.Tiles/HeatMapTile.cs:17-160` with T = the
 * packed u64 cell (`Encoder.cs:5-13`):
 *
 *   bytes 0..3     resolution (u32 LE)
 *   then           res²/64 block pointers (u32 LE each; 0xFFFFFFFF = none)
 *   then           the u64 block heap: 64 cells per block, appended in
 *                  first-touch order; a pointer is the ELEMENT index of the
 *                  block's first cell
 *   cell addressing: pos = x·res + y (x-major), block = pos/64,
 *                  offset = pos % 64; a zero cell means "empty"
 *
 * Parquet relations replace this as the engine's storage (SURVEY §1.3);
 * this codec exists so existing reference tile files can be migrated into
 * the engine (read) and engine output can feed reference tooling (write).
 */
object RefTileFile {
  final val BlockSize = 64
  final val NoBlock = 0xFFFFFFFFL

  /** Decode a tile file → (resolution, non-zero cells (x, y, packedU64)),
    * enumerated in the reference's block-walk order (HeatMapTile.cs:94-111). */
  def read(bytes: Array[Byte]): (Int, Seq[(Int, Int, Long)]) = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val res = bb.getInt(0)
    require(res > 0 && (res * res) % BlockSize == 0, s"bad resolution $res")
    val nBlocks = res * res / BlockSize
    val heapBase = 4 + nBlocks * 4
    val out = Seq.newBuilder[(Int, Int, Long)]
    var b = 0
    while (b < nBlocks) {
      val p = bb.getInt(4 + b * 4) & 0xFFFFFFFFL
      if (p != NoBlock) {
        var o = 0
        while (o < BlockSize) {
          val off = heapBase + (p + o) * 8
          val v = if (off + 8 <= bytes.length) bb.getLong(off.toInt) else 0L
          if (v != 0L) {
            val pos = b * BlockSize + o
            out += ((pos / res, pos % res, v))
          }
          o += 1
        }
      }
      b += 1
    }
    (res, out.result())
  }

  /** S9 — the stream block copy: the reference grows a tile file IN PLACE
    * by resizing the mmap'd heap and copying whole 64-cell blocks
    * (`HeatMapTile.cs` set → `ArrayBase.Resize`, the
    * `Reminiscence` stream copy the SURVEY lists as S9). This is that
    * operation at the byte level: existing blocks are block-copied
    * verbatim, newly touched blocks are appended to the heap tail, and new
    * cell values land inside their (old or new) block. Equivalent to a
    * read-merge-rewrite, but touching only the heap tail — proven equal in
    * RefTileFileSpec. */
  def append(bytes: Array[Byte], cells: Seq[(Int, Int, Long)]): Array[Byte] = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val res = bb.getInt(0)
    val nBlocks = res * res / BlockSize
    val heapBase = 4 + nBlocks * 4
    val heapCells = (bytes.length - heapBase) / 8
    val byBlock = cells.groupBy { case (x, y, _) => (x * res + y) / BlockSize }
    val newBlocks = byBlock.keys.toArray.sorted
      .filter(b => (bb.getInt(4 + b * 4) & 0xFFFFFFFFL) == NoBlock)
    val out = new Array[Byte](bytes.length + newBlocks.length * BlockSize * 8)
    System.arraycopy(bytes, 0, out, 0, bytes.length) // the block copy
    val ob = ByteBuffer.wrap(out).order(ByteOrder.LITTLE_ENDIAN)
    var next = heapCells
    newBlocks.foreach { b =>
      ob.putInt(4 + b * 4, next.toInt)
      next += BlockSize
    }
    byBlock.foreach { case (b, cs) =>
      val pointer = ob.getInt(4 + b * 4) & 0xFFFFFFFFL
      cs.foreach { case (x, y, v) =>
        val off = (x * res + y) % BlockSize
        ob.putLong((heapBase + (pointer + off) * 8).toInt, v)
      }
    }
    out
  }

  /** Encode non-zero cells as a tile file (blocks appended in ascending
    * block order — any pointer arrangement is valid for readers; the
    * reference itself appends in first-touch order). */
  def write(res: Int, cells: Seq[(Int, Int, Long)]): Array[Byte] = {
    require(res > 0 && (res * res) % BlockSize == 0, s"bad resolution $res")
    val nBlocks = res * res / BlockSize
    val byBlock = cells.groupBy { case (x, y, _) => (x * res + y) / BlockSize }
    val touched = byBlock.keys.toArray.sorted
    val heapBase = 4 + nBlocks * 4
    val bytes = new Array[Byte](heapBase + touched.length * BlockSize * 8)
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(0, res)
    var i = 0
    while (i < nBlocks) { bb.putInt(4 + i * 4, NoBlock.toInt); i += 1 }
    touched.zipWithIndex.foreach { case (block, slot) =>
      val pointer = slot * BlockSize
      bb.putInt(4 + block * 4, pointer)
      byBlock(block).foreach { case (x, y, v) =>
        val off = (x * res + y) % BlockSize
        bb.putLong(heapBase + (pointer + off) * 8, v)
      }
    }
    bytes
  }
}
