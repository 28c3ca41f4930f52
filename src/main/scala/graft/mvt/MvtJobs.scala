package graft.mvt

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.MvtCodec
import graft.model.Schemas.{GlobalPixel, MvtTile}

/**
 * MVT export: global pixel relation → one .mvt blob per (z, tx, ty) tile.
 *
 * Re-expresses `/root/reference/src/HeatMap.Tiles/IO/VectorTiles/
 * HeatMapExtensions.cs:22-81` + `Worker.cs:257-279`: features are the
 * non-zero pixels with users > 0 (F6); empty tiles are dropped (no rows →
 * no group → no tile). groupBy tile key shuffles pixel rows once; a tile
 * holds at most res² = 262,144 pixels so no group can exceed a few MB —
 * safely within executor memory at any data scale.
 */
object MvtJobs {
  val Resolution = graft.raster.Rasterize.Resolution

  /** Write tiles as the reference's on-disk layout {out}/{z}/{x}/{y}.mvt
    * (Worker.cs:270-278, HeatMap.cs:148) — distributed foreachPartition,
    * one file per tile, executor-local I/O. `balanceParts` routes the
    * stream through `TileRanges.balanced` first: write tasks become
    * contiguous, byte-balanced spatial neighborhoods (histogram-sized
    * range shuffle) — worth its extra observe pass on big exports. */
  def writeMvtFiles(tiles: org.apache.spark.sql.Dataset[MvtTile], outDir: String,
                    balanceParts: Option[Int] = None): Unit = {
    val stream = balanceParts.fold(tiles) { n =>
      implicit val s: org.apache.spark.sql.SparkSession = tiles.sparkSession
      TileRanges.balanced(tiles, n)
    }
    stream.foreachPartition { (it: Iterator[MvtTile]) =>
      it.foreach { t =>
        val dir = java.nio.file.Paths.get(outDir, t.z.toString, t.tx.toString)
        java.nio.file.Files.createDirectories(dir)
        java.nio.file.Files.write(dir.resolve(s"${t.ty}.mvt"), t.mvt)
      }
    }
  }

  /** z14 MVTs straight from the aggregated tile relation — NARROW: a tile
    * row already holds its cells sorted by pix (x-major, the reference's
    * block-walk order), so no exchange is needed at all. Byte-identical to
    * routing the same pixels through `encodeTiles` (HeatmapPipelineSpec). */
  def encodeZ14FromTileCells(tc: Dataset[graft.model.Schemas.TileCells], k: Int,
                             resolution: Int = Resolution, mercator: Boolean = true)(
      implicit spark: SparkSession): Dataset[MvtTile] = {
    import spark.implicits._
    val res = resolution
    val useMercator = mercator
    tc.flatMap { t =>
      encodeOneZ14(t.tkey, t.cells.length, i => t.cells(i).pix,
        i => t.cells(i).users, i => t.cells(i).trips, k, res, useMercator)
    }
  }

  /** `encodeZ14FromTileCells` over the FLAT cell-array projection
    * (tkey, cells.pix, cells.users, cells.trips) — byte-identical output,
    * but the input decodes as three primitive arrays per tile instead of
    * one object per cell (the dump-backed catalog path reads ~10^7 cells;
    * per-cell `Cell` allocation was the GC-heavy half of the round-3
    * q_hm_mvt_tiles driver anomaly). */
  def encodeZ14Flat(flat: Dataset[(Long, Array[Int], Array[Long], Array[Long])], k: Int,
                    resolution: Int = Resolution, mercator: Boolean = true)(
      implicit spark: SparkSession): Dataset[MvtTile] = {
    import spark.implicits._
    val res = resolution
    val useMercator = mercator
    flat.flatMap { case (tkey, pix, users, trips) =>
      encodeOneZ14(tkey, pix.length, pix(_), users(_), trips(_), k, res, useMercator)
    }
  }

  /** Shared z14 tile-encode kernel: filter by k, place, stream-encode —
    * single pass, primitive buffers only. Cells arrive sorted by pix
    * (x-major), which is the feature order the reference walks.
    * `private[graft]`: also driven as a driver-side loop by the
    * q_hm_mvt_tiles oracle dump (same kernel, different execution path). */
  private[graft] def encodeOneZ14(tkey: Long, n: Int, pix: Int => Int,
                           users: Int => Long, trips: Int => Long,
                           k: Int, res: Int, useMercator: Boolean): Iterator[MvtTile] = {
    val tx = tkey >>> 32
    val ty = tkey & 0xFFFFFFFFL
    val zoom = graft.raster.Rasterize.Zoom
    val scale = MvtCodec.Extent / res
    val placer = if (useMercator)
      graft.core.WebMercator.placer(zoom, tx, ty, res, MvtCodec.Extent) else null
    val ex = new Array[Long](n); val ey = new Array[Long](n)
    val fu = new Array[Long](n); val ft = new Array[Long](n)
    var m = 0
    var i = 0
    while (i < n) {
      val u = users(i)
      if (u >= k) {
        val p = pix(i)
        if (useMercator) { ex(m) = placer.ex(p / res); ey(m) = placer.ey(p % res) }
        else { ex(m) = (p / res).toLong * scale; ey(m) = (p % res).toLong * scale }
        fu(m) = u; ft(m) = trips(i)
        m += 1
      }
      i += 1
    }
    if (m == 0) Iterator.empty
    else Iterator.single(MvtTile(zoom, tx, ty, MvtCodec.encodeTilePoints(m, ex, ey, fu, ft)))
  }

  /** Encode tiles. `mercator = true` (default) reproduces the REFERENCE
    * STACK's placement formulas: linear pixel → lon/lat
    * (TileGeometryTransform.TransformTo), then the external Mapbox writer's
    * true-Mercator quantization onto the extent grid
    * (WebMercator.extentCoords). Caveat: the external NTS writer's exact
    * float-op ORDER is not verifiable in this sandbox (no captured NTS
    * output), so placement may differ by ±1 extent unit (≈0.1 % of a pixel)
    * where a coordinate lands within 1 ulp of an integer boundary — see
    * WebMercator.TilePlacer. `mercator = false` is the direct linear
    * quantization (px·extent/res) — sub-pixel-different in y only
    * (MvtCodecSpec quantifies the divergence). */
  def encodeTiles(pixels: Dataset[GlobalPixel], resolution: Int = Resolution,
                  mercator: Boolean = true)(
      implicit spark: SparkSession): Dataset[MvtTile] = {
    import spark.implicits._
    val res = resolution
    val useMercator = mercator
    pixels
      .where($"users" > 0)
      .withColumn("tx", $"gx" / res cast "long")
      .withColumn("ty", $"gy" / res cast "long")
      .withColumn("px", ($"gx" % res).cast("int"))
      .withColumn("py", ($"gy" % res).cast("int"))
      .select($"z", $"tx", $"ty", $"px", $"py", $"users", $"trips")
      .as[(Int, Long, Long, Int, Int, Long, Long)]
      .groupByKey(r => (r._1, r._2, r._3))
      .mapGroups { (key: (Int, Long, Long), rows: Iterator[(Int, Long, Long, Int, Int, Long, Long)]) =>
        val (z, tx, ty) = key
        var pos = new Array[Long](256)
        var us = new Array[Long](256)
        var tr = new Array[Long](256)
        var n = 0
        rows.foreach { case (_, _, _, px, py, users, trips) =>
          if (n == pos.length) {
            pos = java.util.Arrays.copyOf(pos, n << 1)
            us = java.util.Arrays.copyOf(us, n << 1)
            tr = java.util.Arrays.copyOf(tr, n << 1)
          }
          pos(n) = px.toLong * res + py; us(n) = users; tr(n) = trips
          n += 1
        }
        encodeOneTile(z, tx, ty, n, pos, us, tr, res, useMercator)
      }
  }

  /** Lower-level MVT export in ONE shuffle, straight from tile-local
    * pyramid PARTIALS (`Pyramid.lowerPartialsFlat`): the per-pixel merge
    * that `lowerLevelsFromTiles`' groupBy used to do in its own exchange
    * happens inside the per-tile group instead — partials for a tile land
    * on one reducer anyway, so the extra pixel-grain exchange bought
    * nothing. Byte-identical to
    * `encodeTiles(lowerLevelsFromTiles(tc))` (HeatmapPipelineSpec). */
  def encodeLowerFused(partials: Dataset[GlobalPixel],
                       resolution: Int = Resolution, mercator: Boolean = true)(
      implicit spark: SparkSession): Dataset[MvtTile] = {
    import spark.implicits._
    val res = resolution
    val useMercator = mercator
    partials
      .groupByKey(p => (p.z, p.gx / res, p.gy / res))
      .mapGroups { (key: (Int, Long, Long), rows: Iterator[GlobalPixel]) =>
        val (z, tx, ty) = key
        val users = new scala.collection.mutable.LongMap[Long](1024)
        val trips = new scala.collection.mutable.LongMap[Long](1024)
        rows.foreach { p =>
          val pos = (p.gx % res) * res + (p.gy % res)
          users.update(pos, users.getOrElse(pos, 0L) + p.users)
          trips.update(pos, trips.getOrElse(pos, 0L) + p.trips)
        }
        val n = users.size
        val pos = new Array[Long](n)
        var i = 0
        users.foreachKey { k => pos(i) = k; i += 1 }
        java.util.Arrays.sort(pos)
        val us = new Array[Long](n); val tr = new Array[Long](n)
        i = 0
        while (i < n) { us(i) = users(pos(i)); tr(i) = trips(pos(i)); i += 1 }
        encodeOneTile(z, tx, ty, n, pos, us, tr, res, useMercator)
      }
  }

  /** Encode one tile from position-keyed counters: sort x-major (pos =
    * px·res + py ascending — the reference's block-walk order,
    * HeatMapTile.cs:94-112), place, stream-encode. */
  private[graft] def encodeOneTile(z: Int, tx: Long, ty: Long, n: Int,
                            pos: Array[Long], us: Array[Long], tr: Array[Long],
                            res: Int, useMercator: Boolean): MvtTile = {
    // sort the three parallel arrays by pos: pack pos (≤ res² < 2^24 bits)
    // with the source index, sort the packed keys, then gather
    val packed = new Array[Long](n)
    var i = 0
    while (i < n) { packed(i) = (pos(i) << 32) | i.toLong; i += 1 }
    java.util.Arrays.sort(packed)
    val scale = MvtCodec.Extent / res
    val placer = if (useMercator)
      graft.core.WebMercator.placer(z, tx, ty, res, MvtCodec.Extent) else null
    val ex = new Array[Long](n); val ey = new Array[Long](n)
    val fu = new Array[Long](n); val ft = new Array[Long](n)
    i = 0
    while (i < n) {
      val p = packed(i) >>> 32
      val src = (packed(i) & 0xFFFFFFFFL).toInt
      val px = (p / res).toInt; val py = (p % res).toInt
      if (useMercator) { ex(i) = placer.ex(px); ey(i) = placer.ey(py) }
      else { ex(i) = px.toLong * scale; ey(i) = py.toLong * scale }
      fu(i) = us(src); ft(i) = tr(src)
      i += 1
    }
    MvtTile(z, tx, ty, MvtCodec.encodeTilePoints(n, ex, ey, fu, ft))
  }
}
