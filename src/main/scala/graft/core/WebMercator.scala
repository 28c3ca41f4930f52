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
    val p = placer(zoom, tx, ty, res, extent)
    (p.ex(px), p.ey(py))
  }

  /** Per-TILE placement kernel: the tile-constant terms (box, Mercator
    * corner, extent resolution) are computed once, and since extent x
    * depends only on px and extent y only on py, each axis value is
    * computed once per distinct coordinate (identical arithmetic to the
    * per-pixel form — same doubles, same truncation — just not re-evaluated
    * millions of times on the MVT-encode hot path).
    *
    * Precision caveat (not a byte-for-byte claim): this truncates the
    * TILE-RELATIVE offset `(m − mCorner)/r`; a writer that truncates the
    * GLOBAL pixel coordinate before subtracting the tile offset can differ
    * by 1 extent unit when the coordinate lands within a double ulp of an
    * integer boundary. The external NTS writer's exact op order is not
    * capturable in this sandbox, so the guarantee is: same formulas
    * (standard "Global Map Tiles" math + C#-style trunc-toward-zero),
    * divergence bounded to ±1 extent unit at ulp boundaries, guarded
    * against an independently re-derived formula in MvtCodecSpec. */
  final class TilePlacer(zoom: Int, tx: Long, ty: Long, res: Int, extent: Int) {
    private val (left, top, right, bottom) = Slippy.boxXY(zoom, tx, ty)
    private val latStep = (top - bottom) / res
    private val lonStep = (right - left) / res
    private val (mLeft, mTop) = latLonToMeters(top, left)
    private val r = resolution(zoom, extent)
    private val exCache = new Array[Long](res)
    private val exSet = new Array[Boolean](res)
    private val eyCache = new Array[Long](res)
    private val eySet = new Array[Boolean](res)

    def ex(px: Int): Long = {
      if (px >= 0 && px < res && exSet(px)) return exCache(px)
      val lon = left + (lonStep * px) // Slippy.fromLocalTileCoordinates x-term
      val mx = lon * OriginShift / 180.0
      val v = ((mx - mLeft) / r).toLong
      if (px >= 0 && px < res) { exCache(px) = v; exSet(px) = true }
      v
    }

    def ey(py: Int): Long = {
      if (py >= 0 && py < res && eySet(py)) return eyCache(py)
      val lat = top - (py * latStep) // Slippy.fromLocalTileCoordinates y-term
      val my0 = math.log(math.tan((90.0 + lat) * math.Pi / 360.0)) / (math.Pi / 180.0)
      val my = my0 * OriginShift / 180.0
      val v = ((mTop - my) / r).toLong
      if (py >= 0 && py < res) { eyCache(py) = v; eySet(py) = true }
      v
    }
  }

  def placer(zoom: Int, tx: Long, ty: Long, res: Int, extent: Int): TilePlacer =
    new TilePlacer(zoom, tx, ty, res, extent)
}
