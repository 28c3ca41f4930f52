package graft.core

/**
 * Slippy-map (Web-Mercator) tile/pixel math.
 *
 * Exact re-expression of the reference's coordinate kernel
 * (`/root/reference/src/HeatMap.Tiles/TileStatic.cs:9-268`). Pixel
 * assignments must match the reference bit-for-bit, so the formulas —
 * including the mixed float literals in `WorldToTile`
 * (TileStatic.cs:162-165, all exactly representable in binary so the
 * double-math is identical) and the truncation-toward-zero `(int)` casts
 * (TileStatic.cs:115) — are transliterated literally.
 *
 * Tile ids are row-major over the slippy grid: `id = y * 2^z + x`
 * (TileStatic.cs:21-25). We use Long throughout where the reference uses
 * uint (values fit comfortably: at z=14 the max id is 2^28).
 */
object Slippy {

  /** TileStatic.cs:9-14 — local id → (x, y). */
  @inline def toTile(zoom: Int, tileId: Long): (Long, Long) = {
    val xMax = 1L << zoom
    (tileId % xMax, tileId / xMax)
  }

  /** TileStatic.cs:21-25 — (x, y) → local id. */
  @inline def toLocalId(x: Long, y: Long, zoom: Int): Long =
    y * (1L << zoom) + x

  /**
   * TileStatic.cs:33-46 — tile → WGS84 box.
   * Returns (left, top, right, bottom).
   */
  def box(zoom: Int, tileId: Long): (Double, Double, Double, Double) = {
    val (tx, ty) = toTile(zoom, tileId)
    boxXY(zoom, tx, ty)
  }

  def boxXY(zoom: Int, tx: Long, ty: Long): (Double, Double, Double, Double) = {
    var n = math.Pi - ((2.0 * math.Pi * ty) / math.pow(2.0, zoom))
    val left = (tx / math.pow(2.0, zoom) * 360.0) - 180.0
    val top = 180.0 / math.Pi * math.atan(math.sinh(n))
    n = math.Pi - ((2.0 * math.Pi * (ty + 1)) / math.pow(2.0, zoom))
    val right = ((tx + 1) / math.pow(2.0, zoom) * 360.0) - 180.0
    val bottom = 180.0 / math.Pi * math.atan(math.sinh(n))
    (left, top, right, bottom)
  }

  /**
   * TileStatic.cs:156-168 — lon/lat → tile (x, y).
   * The reference mixes float literals (180.0f, 360.0f, 1.0f, 2f) into
   * double expressions; every one of those floats is exactly representable
   * as a double, so plain double literals reproduce the values exactly.
   * The C# `(uint)` cast truncates toward zero; `.toLong` does the same
   * for the in-range (non-negative) values this is defined over.
   */
  def worldToTile(longitude: Double, latitude: Double, zoom: Int): (Long, Long) = {
    val n = math.floor(math.pow(2, zoom)).toInt
    val rad = (latitude / 180d) * math.Pi
    val x = ((longitude + 180.0) / 360.0 * n).toLong
    val y = (((1.0 - math.log(math.tan(rad) + 1.0 / math.cos(rad)) / math.Pi) / 2.0) * n).toLong
    (x, y)
  }

  /** TileStatic.cs:145-154. */
  def worldTileLocalId(longitude: Double, latitude: Double, zoom: Int): Long = {
    val (x, y) = worldToTile(longitude, latitude, zoom)
    toLocalId(x, y, zoom)
  }

  /**
   * TileStatic.cs:100-116 — lon/lat → pixel (px, py) inside a tile, with
   * *linear* latitude interpolation inside the tile box (deliberately not
   * true within-tile Mercator; replicated as-is).
   */
  def toLocalTileCoordinates(zoom: Int, tileId: Long, longitude: Double,
                             latitude: Double, resolution: Int): (Int, Int) = {
    val (left, top, right, bottom) = box(zoom, tileId)
    val latStep = (top - bottom) / resolution
    val lonStep = (right - left) / resolution
    (((longitude - left) / lonStep).toInt, ((top - latitude) / latStep).toInt)
  }

  /** TileStatic.cs:84-92 — lon/lat → (px, py, tileId) at a zoom. */
  def toLocalTileCoordinatesWithTile(zoom: Int, longitude: Double, latitude: Double,
                                     resolution: Int): (Int, Int, Long) = {
    val tileId = worldTileLocalId(longitude, latitude, zoom)
    val (px, py) = toLocalTileCoordinates(zoom, tileId, longitude, latitude, resolution)
    (px, py, tileId)
  }

  /**
   * TileStatic.cs:126-143 — pixel → lon/lat of the pixel's top-left corner.
   */
  def fromLocalTileCoordinates(zoom: Int, tileId: Long, x: Int, y: Int,
                               resolution: Int): (Double, Double) = {
    val (left, top, right, bottom) = box(zoom, tileId)
    val latStep = (top - bottom) / resolution
    val lonStep = (right - left) / resolution
    (left + (lonStep * x), top - (y * latStep))
  }

  /**
   * Diffs/HeatMapDiffExtensions.cs:14-24 — lon/lat → global pixel coords at
   * a zoom: (tile.x * res + px, tile.y * res + py). Returns None when the
   * optional tile-inclusion predicate rejects the z-tile (the caller then
   * *bridges* over the dropped vertex — Draw/HeatMapDiffExtensions.cs:52-53).
   */
  def toHeatMapCoordinates(zoom: Int, resolution: Int, longitude: Double, latitude: Double,
                           includeTile: Long => Boolean = _ => true): Option[(Long, Long)] = {
    val (px, py, tileId) = toLocalTileCoordinatesWithTile(zoom, longitude, latitude, resolution)
    if (!includeTile(tileId)) None
    else {
      val (tx, ty) = toTile(zoom, tileId)
      Some((tx * resolution + px, ty * resolution + py))
    }
  }

  /** TileStatic.cs:26-30 — exclusive local-id bound. The reference returns
    * xMax² + xMax, one extra ROW beyond the grid (its own quirk, kept
    * bit-for-bit: callers use it only as an upper bound). */
  @inline def maxLocalId(zoom: Int): Long = {
    val xMax = 1L << zoom
    xMax * xMax + xMax
  }

  /** TileStatic.cs:48-63 — fractional tile coordinates of a lon/lat inside
    * a tile (tile.x + lonFraction, tile.y + bottomUpLatFraction). The
    * reference carries a TODO doubting the y orientation (latitude fraction
    * measured bottom-up while tile y grows north-down); replicated as-is —
    * this is the documented-dead-but-present surface. */
  def subCoordinates(zoom: Int, tileId: Long, longitude: Double,
                     latitude: Double): (Double, Double) = {
    val (x, y) = toTile(zoom, tileId)
    val (left, top, right, bottom) = boxXY(zoom, x, y)
    val leftOffset = longitude - left
    val bottomOffset = latitude - bottom
    (x + (leftOffset / (right - left)), y + (bottomOffset / (top - bottom)))
  }

  /** TileStatic.cs:64-83 — 4-connectivity tile adjacency (N/S/E/W only;
    * diagonals are NOT direct neighbours, nor is a tile its own). */
  def isDirectNeighbour(zoom: Int, t1: Long, t2: Long): Boolean = {
    val (x1, y1) = toTile(zoom, t1)
    val (x2, y2) = toTile(zoom, t2)
    if (x1 == x2) y1 == y2 + 1 || y1 == y2 - 1
    else if (y1 == y2) x1 == x2 + 1 || x1 == x2 - 1
    else false
  }

  /** Hierarchical cell id (quadkey, public Bing-maps scheme): x/y bits
    * interleaved most-significant first, packed with the zoom in the low 5
    * bits — `key = interleave(x, y) << 5 | zoom`. The property the flat
    * `toLocalId` lacks and H3/S2 ids have: a parent's digit string is a
    * PREFIX of every descendant's, so ancestor tests and subtree scans are
    * shifts/range predicates (parquet min-max prunable) instead of joins.
    * Fits a Long for zoom ≤ 29 (validated — a deeper zoom would silently
    * overflow the packing; negative zoom is meaningless). */
  @inline def quadKey(x: Long, y: Long, zoom: Int): Long = {
    require(zoom >= 0 && zoom <= 29, s"quadKey zoom must be in [0, 29], got $zoom")
    var k = 0L
    var i = zoom - 1
    while (i >= 0) {
      k = (k << 2) | (((y >> i) & 1L) << 1) | ((x >> i) & 1L)
      i -= 1
    }
    (k << 5) | zoom
  }

  /** quadkey → (x, y, zoom). */
  def fromQuadKey(key: Long): (Long, Long, Int) = {
    val zoom = (key & 0x1FL).toInt
    var k = key >>> 5
    var x = 0L; var y = 0L
    var i = 0
    while (i < zoom) {
      x |= (k & 1L) << i
      y |= ((k >> 1) & 1L) << i
      k >>= 2
      i += 1
    }
    (x, y, zoom)
  }

  /** lon/lat → quadkey at a zoom (the batched cell-ENCODING kernel the
    * codegen'd `quad_key` expression calls). */
  def worldToQuadKey(longitude: Double, latitude: Double, zoom: Int): Long = {
    val (x, y) = worldToTile(longitude, latitude, zoom)
    quadKey(x, y, zoom)
  }

  /** Ancestor quadkey at a lower zoom: drop the trailing digits (the
    * prefix property — no coordinate round trip needed). */
  @inline def quadKeyParent(key: Long, parentZoom: Int): Long = {
    val zoom = (key & 0x1FL).toInt
    (((key >>> 5) >> (2 * (zoom - parentZoom))) << 5) | parentZoom
  }

  /** True iff `ancestor` is a (transitive) parent cell of `key`. */
  @inline def quadKeyContains(ancestor: Long, key: Long): Boolean = {
    val az = (ancestor & 0x1FL).toInt
    val kz = (key & 0x1FL).toInt
    kz >= az && quadKeyParent(key, az) == ancestor
  }

  /** TileStatic.cs:184-196 — ancestor tile at a lower zoom. */
  def parentTileFor(x: Long, y: Long, zoom: Int, parentZoom: Int): (Long, Long) = {
    val dz = zoom - parentZoom
    (x >> dz, y >> dz)
  }

  /** TileStatic.cs:198-214 — descendant tiles at a higher zoom. */
  def subTilesFor(x: Long, y: Long, zoom: Int, childZoom: Int): Iterator[(Long, Long)] = {
    val factor = 1L << (childZoom - zoom)
    val x0 = x * factor; val y0 = y * factor
    for {
      cx <- Iterator.range(x0, x0 + factor)
      cy <- Iterator.range(y0, y0 + factor)
    } yield (cx, cy)
  }

  /** TileStatic.cs:170-182 — bbox → covering tiles at a zoom. */
  def tilesFor(leftLon: Double, topLat: Double, rightLon: Double, bottomLat: Double,
               zoom: Int): Iterator[(Long, Long)] = {
    val (x0, y0) = worldToTile(leftLon, topLat, zoom)
    val (x1, y1) = worldToTile(rightLon, bottomLat, zoom)
    for {
      x <- Iterator.range(x0, x1 + 1)
      y <- Iterator.range(y0, y1 + 1)
    } yield (x, y)
  }

  /**
   * TileStatic.cs:235-268 — tile → bounding polygon with a margin
   * (percent of tile size). Returned as a closed ring of (lon, lat),
   * clockwise from the top-left, last point == first.
   */
  def toPolygon(zoom: Int, tileId: Long, margin: Int = 5): Array[(Double, Double)] = {
    val (left, top, right, bottom) = box(zoom, tileId)
    val factor = margin / 100f
    val xMar = math.abs((right - left) * factor)
    val yMar = math.abs((top - bottom) * factor)
    Array(
      (left - xMar, top + yMar),
      (right + xMar, top + yMar),
      (right + xMar, bottom - yMar),
      (left - xMar, bottom - yMar),
      (left - xMar, top + yMar))
  }
}
