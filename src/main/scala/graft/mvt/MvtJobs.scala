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
    * one file per tile, executor-local I/O. */
  def writeMvtFiles(tiles: org.apache.spark.sql.Dataset[MvtTile], outDir: String): Unit = {
    tiles.foreachPartition { (it: Iterator[MvtTile]) =>
      it.foreach { t =>
        val dir = java.nio.file.Paths.get(outDir, t.z.toString, t.tx.toString)
        java.nio.file.Files.createDirectories(dir)
        java.nio.file.Files.write(dir.resolve(s"${t.ty}.mvt"), t.mvt)
      }
    }
  }

  def encodeTiles(pixels: Dataset[GlobalPixel], resolution: Int = Resolution)(
      implicit spark: SparkSession): Dataset[MvtTile] = {
    import spark.implicits._
    val res = resolution
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
        val feats = rows.map { case (_, _, _, px, py, users, trips) =>
          MvtCodec.PixelFeature(px, py, users, trips)
        }.toArray.sortBy(f => (f.px.toLong * res) + f.py)
        MvtTile(key._1, key._2, key._3, MvtCodec.encodeTile(feats, res))
      }
  }
}
