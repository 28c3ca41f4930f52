package graft.agg

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Schemas.GlobalPixel

/**
 * Tile-set maintenance operators over the global pixel relation —
 * relational forms of the reference's in-memory tile-map surgery:
 *
 *  - `removeTiles` (A12): `HeatMapDiff.RemoveAll(toRemove)`
 *    (`/root/reference/src/HeatMap.Tiles/Diffs/HeatMapDiff.cs:112-121`) —
 *    detach every tile matching a predicate. Relationally: drop all pixel
 *    rows of the selected tiles (a broadcast anti-join; the selected set is
 *    small by contract — it is the reference's in-memory id list).
 *
 *  - `copyTilesTo` (J5): `HeatMapExtensions.CopyTilesTo`
 *    (`HeatMapExtensions.cs:23-56`) — copy the selected tiles' non-zero
 *    values from a source map into a target map, value-translated,
 *    OVERWRITING colliding pixels (the reference assigns
 *    `targetTile[x,y] = value`, it does not add) while target pixels the
 *    source doesn't touch keep their values. Relationally: per-pixel upsert
 *    restricted to the selected-and-present-in-source tiles.
 */
object TileOps {
  private def tileCols(res: Int) = Seq(
    col("z"), floor(col("gx") / res).cast("long").as("tx"),
    floor(col("gy") / res).cast("long").as("ty"))

  /** A12: drop every pixel of the selected (z, tx, ty) tiles. */
  def removeTiles(pixels: Dataset[GlobalPixel], tiles: Seq[(Int, Long, Long)],
                  res: Int = graft.raster.Rasterize.Resolution)(
      implicit spark: SparkSession): Dataset[GlobalPixel] = {
    import spark.implicits._
    val sel = tiles.toDF("z", "tx", "ty")
    pixels.toDF()
      .withColumn("tx", floor(col("gx") / res).cast("long"))
      .withColumn("ty", floor(col("gy") / res).cast("long"))
      .join(broadcast(sel), Seq("z", "tx", "ty"), "left_anti")
      .drop("tx", "ty")
      .as[GlobalPixel]
  }

  /** J5: upsert the selected tiles from `source` into `target`:
    * translated source pixels (kept only while > 0, like the reference's
    * `value > 0` guard) overwrite colliding target pixels; everything else
    * in the target is preserved. `translate` maps the (users, trips) pair
    * columns; identity by default. */
  def copyTilesTo(source: Dataset[GlobalPixel], target: Dataset[GlobalPixel],
                  tiles: Seq[(Int, Long, Long)],
                  translate: DataFrame => DataFrame = identity,
                  res: Int = graft.raster.Rasterize.Resolution)(
      implicit spark: SparkSession): Dataset[GlobalPixel] = {
    import spark.implicits._
    val sel = tiles.toDF("z", "tx", "ty")
    val copied = translate(
      source.toDF()
        .withColumn("tx", floor(col("gx") / res).cast("long"))
        .withColumn("ty", floor(col("gy") / res).cast("long"))
        .join(broadcast(sel), Seq("z", "tx", "ty"), "left_semi")
        .drop("tx", "ty"))
      .where(col("trips") > 0)
      .select(col("z"), col("gx"), col("gy"), col("users"), col("trips"))
    val kept = target.toDF()
      .join(copied.select(col("z"), col("gx"), col("gy")), Seq("z", "gx", "gy"), "left_anti")
    kept.unionByName(copied).as[GlobalPixel]
  }
}
