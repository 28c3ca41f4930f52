package graft.core

/**
 * Web-Mercator (EPSG:3857) math — the projection the reference's EXTERNAL
 * vector-tile writer applies when placing features on the extent grid.
 *
 * The reference converts a pixel to lon/lat with a LINEAR within-tile
 * transform (`/root/reference/src/HeatMap.Tiles/TileGeometryTransform.cs:52-75`,
 * used by `IO/VectorTiles/HeatMapExtensions.cs:52-70`), then hands the
 * point to NetTopologySuite.IO.VectorTiles' MapboxTileWriter, which
 * re-projects through TRUE Mercator meters before quantizing to the extent
 * grid. Longitude is linear in Mercator x, so extent x lands exactly on
 * px·extent/res; latitude is NOT, so extent y differs from py·extent/res by
 * a sub-pixel offset that this module reproduces exactly (standard
 * "Global Map Tiles" formulas; truncation toward zero like the C# (int)
 * cast).
 */
object WebMercator {
  /** Half the Web-Mercator world span in meters: π · 6378137. */
  final val OriginShift: Double = 2.0 * math.Pi * 6378137.0 / 2.0

  /** WGS84 lon/lat → Mercator meters (x, y). */
  def latLonToMeters(lat: Double, lon: Double): (Double, Double) = {
    val mx = lon * OriginShift / 180.0
    val my0 = math.log(math.tan((90.0 + lat) * math.Pi / 360.0)) / (math.Pi / 180.0)
    (mx, my0 * OriginShift / 180.0)
  }

  /** Meters per extent-unit at a zoom for a tile gridded `tileSize` wide. */
  def resolution(zoom: Int, tileSize: Int): Double =
    (2.0 * math.Pi * 6378137.0 / tileSize) / (1L << zoom).toDouble

  /**
   * The reference stack's placement of heatmap pixel (px, py) of tile
   * (tx, ty, zoom, res) onto the MVT extent grid:
   *   1. pixel → lon/lat, LINEAR inside the tile box (TileGeometryTransform
   *      .TransformTo — the reference's own step);
   *   2. lon/lat → Mercator meters → extent offset from the tile's
   *      top-left, truncated toward zero (the external Mapbox writer's step).
   */
  def extentCoords(zoom: Int, tx: Long, ty: Long, px: Int, py: Int,
                   res: Int, extent: Int): (Long, Long) = {
    val tileId = Slippy.toLocalId(tx, ty, zoom)
    val (lon, lat) = Slippy.fromLocalTileCoordinates(zoom, tileId, px, py, res)
    val (left, top, _, _) = Slippy.boxXY(zoom, tx, ty)
    val (mx, my) = latLonToMeters(lat, lon)
    val (mLeft, mTop) = latLonToMeters(top, left)
    val r = resolution(zoom, extent)
    (((mx - mLeft) / r).toLong, ((mTop - my) / r).toLong)
  }
}
