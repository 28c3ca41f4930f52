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
    val zoom = graft.raster.Rasterize.Zoom
    val scale = MvtCodec.Extent / res
    tc.flatMap { t =>
      val tx = t.tkey >>> 32
      val ty = t.tkey & 0xFFFFFFFFL
      val placer = if (useMercator)
        graft.core.WebMercator.placer(zoom, tx, ty, res, MvtCodec.Extent) else null
      val feats = t.cells.iterator.filter(_.users >= k).map { c =>
        val (ex, ey) =
          if (useMercator) (placer.ex(c.pix / res), placer.ey(c.pix % res))
          else ((c.pix / res).toLong * scale, (c.pix % res).toLong * scale)
        MvtCodec.ExtentFeature(ex, ey, c.users, c.trips)
      }.toArray
      if (feats.isEmpty) Iterator.empty
      else Iterator.single(MvtTile(zoom, tx, ty, MvtCodec.encodeTileExtent(feats)))
    }
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
        // deterministic feature order: x-major like the reference's block walk
        // (HeatMapTile.cs:94-112 enumerates pos = x*res + y ascending)
        val (z, tx, ty) = key
        val scale = MvtCodec.Extent / res
        val placer = if (useMercator)
          graft.core.WebMercator.placer(z, tx, ty, res, MvtCodec.Extent) else null
        val feats = rows.map { case (_, _, _, px, py, users, trips) =>
          val (ex, ey) =
            if (useMercator) (placer.ex(px), placer.ey(py))
            else (px.toLong * scale, py.toLong * scale)
          (px.toLong * res + py, MvtCodec.ExtentFeature(ex, ey, users, trips))
        }.toArray.sortBy(_._1)
        MvtTile(z, tx, ty, MvtCodec.encodeTileExtent(feats.map(_._2)))
      }
  }
}
