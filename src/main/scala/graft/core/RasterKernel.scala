package graft.core

import scala.collection.mutable

/**
 * Track → heatmap-pixel rasterization kernel (pure, per-row; used inside the
 * Spark rasterizer's typed flatMap).
 *
 * Semantics-exact re-expression of the reference draw path
 * (`/root/reference/src/HeatMap.Tiles/Draw/HeatMapDiffExtensions.cs:35-60`):
 *  - only LineStrings with ≥1 coordinate are drawn (F1); the caller filters
 *    nulls (F2);
 *  - each consecutive vertex pair is Bresenham-drawn inclusive of both
 *    endpoints, so interior vertices accumulate cost twice (A2);
 *  - a vertex whose z-tile is rejected by `includeTile` is skipped and the
 *    next segment BRIDGES from the previous accepted vertex
 *    (HeatMapDiffExtensions.cs:52-53, F4);
 *  - pixels with negative global x or y are discarded (F5).
 */
object RasterKernel {

  /**
   * Rasterize one polyline; returns per-pixel accumulated cost.
   * Pre-aggregating per track keeps the Spark shuffle at (pixel, count)
   * grain instead of one row per visited pixel — a map-side combine the
   * row-per-visit representation would pay for later.
   */
  def rasterize(coords: Array[Array[Double]], zoom: Int, resolution: Int,
                cost: Long = 1L,
                includeTile: Long => Boolean = _ => true): mutable.LongMap[Long] = {
    // key = gx << 32 | gy (global pixel coords at z14/512 fit 23+9=23 bits each)
    val acc = new mutable.LongMap[Long]()
    if (coords == null || coords.length == 0) return acc

    @inline def draw(x: Long, y: Long): Unit = {
      if (x >= 0 && y >= 0) {
        val k = (x << 32) | y
        acc.update(k, acc.getOrElse(k, 0L) + cost)
      }
    }

    var previous: Option[(Long, Long)] =
      Slippy.toHeatMapCoordinates(zoom, resolution, coords(0)(0), coords(0)(1), includeTile)
    var c = 1
    while (c < coords.length) {
      val current = Slippy.toHeatMapCoordinates(zoom, resolution, coords(c)(0), coords(c)(1), includeTile)
      current match {
        case Some((cx, cy)) =>
          previous match {
            case Some((px, py)) => Bresenham.foreachPixel(px, py, cx, cy)(draw)
            case None =>
          }
          previous = current
        case None => // bridge: previous unchanged (HeatMapDiffExtensions.cs:52-53)
      }
      c += 1
    }
    acc
  }

  @inline def keyGx(key: Long): Long = key >>> 32
  @inline def keyGy(key: Long): Long = key & 0xFFFFFFFFL
}
