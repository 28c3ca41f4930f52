package graft.core

/**
 * All-octant integer Bresenham line rasterization, visiting every pixel on
 * the segment inclusive of BOTH endpoints.
 *
 * Semantics-exact re-expression of
 * `/root/reference/src/HeatMap.Tiles/Draw/Bresenhams.cs:8-37` (itself the
 * classic "all cases covered" integer formulation). Pixel-visit order and
 * set must match exactly — the heatmap's per-pixel trip counts depend on it.
 */
object Bresenham {

  /** Visit every pixel from (x0,y0) to (x1,y1) inclusive. */
  def foreachPixel(x0: Long, y0: Long, x1: Long, y1: Long)(draw: (Long, Long) => Unit): Unit = {
    var x = x0; var y = y0
    val w = x1 - x0
    val h = y1 - y0
    var dx1 = 0L; var dy1 = 0L; var dx2 = 0L; var dy2 = 0L
    if (w < 0) dx1 = -1 else if (w > 0) dx1 = 1
    if (h < 0) dy1 = -1 else if (h > 0) dy1 = 1
    if (w < 0) dx2 = -1 else if (w > 0) dx2 = 1
    var longest = math.abs(w)
    var shortest = math.abs(h)
    if (!(longest > shortest)) {
      longest = math.abs(h)
      shortest = math.abs(w)
      if (h < 0) dy2 = -1 else if (h > 0) dy2 = 1
      dx2 = 0
    }
    var numerator = longest >> 1
    var i = 0L
    while (i <= longest) {
      draw(x, y)
      numerator += shortest
      if (!(numerator < longest)) {
        numerator -= longest
        x += dx1
        y += dy1
      } else {
        x += dx2
        y += dy2
      }
      i += 1
    }
  }

  /** Pixel count of the segment: max(|dx|, |dy|) + 1. */
  @inline def pixelCount(x0: Long, y0: Long, x1: Long, y1: Long): Long =
    math.max(math.abs(x1 - x0), math.abs(y1 - y0)) + 1

  /** Materialized pixel list (tests / small segments). */
  def pixels(x0: Long, y0: Long, x1: Long, y1: Long): Array[(Long, Long)] = {
    val out = Array.newBuilder[(Long, Long)]
    out.sizeHint(pixelCount(x0, y0, x1, y1).toInt)
    foreachPixel(x0, y0, x1, y1)((x, y) => out += ((x, y)))
    out.result()
  }
}
