package graft.mvt

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.core.Slippy
import graft.model.Schemas.MvtTile

/**
 * Histogram-sized RANGE partitioning for the tile export — the north
 * star's "range-partitioned shuffles sized by observed cell histograms",
 * made concrete:
 *
 *   1. OBSERVE: aggregate the tile stream's byte weights at a coarse
 *      quadkey grain (≤ 4^baseZoom cells — bounded by the GRID, not the
 *      data, so the driver-side histogram is a legitimate collect at any
 *      scale), then ADAPTIVELY REFINE: any cell heavier than one range's
 *      budget re-aggregates at a finer grain restricted to the hot cells
 *      (a quadtree descent — each pass touches ≤ nParts hot subtrees, so
 *      the histogram stays small however extreme the skew).
 *   2. SIZE: partition boundaries are weighted quantiles over the SORTED,
 *      zoom-ALIGNED key space — every range carries ≈ equal bytes: an
 *      urban core holding 80 % of the bytes is split across many ranges,
 *      empty ocean collapses into one.
 *   3. RANGE-partition: tiles shuffle by binary-searched range id through
 *      an identity partitioner. Ranges are CONTIGUOUS in quadkey space
 *      (prefix property, `Slippy.quadKey`), so an export task writes one
 *      locality-friendly spatial neighborhood while staying balanced —
 *      hash placement balances but scatters neighbors; key-uniform ranges
 *      keep neighbors but skew (TileRangesSpec demonstrates both).
 */
object TileRanges {
  /** Every key is left-aligned to the z14 grid so cells of DIFFERENT
    * grains sort together spatially: an aligned key is the interleaved
    * quadkey of the cell's first z14 descendant. */
  val AlignZoom = 14

  /** Aligned key of a tile (z ≤ 14). */
  def alignedKey(z: Int, tx: Long, ty: Long): Long =
    (Slippy.quadKey(tx, ty, z) >>> 5) << (2 * (AlignZoom - z))

  /** Aligned [start, end] span of the CELL covering a tile at `cellZoom`
    * (a tile coarser than the grain is its own cell). */
  def cellSpan(z: Int, tx: Long, ty: Long, cellZoom: Int): (Long, Long) = {
    val cz = math.min(z, cellZoom)
    val (cx, cy) = (tx >> (z - cz), ty >> (z - cz))
    val start = alignedKey(cz, cx, cy)
    (start, start + (1L << (2 * (AlignZoom - cz))) - 1)
  }

  /** One histogram cell: aligned span + observed weight + its grain. */
  final case class Cell(start: Long, end: Long, weight: Long, zoom: Int)

  private def pass(tiles: Dataset[MvtTile], cellZoom: Int,
                   restrictTo: Option[Set[Long]], prevZoom: Int)(
      implicit spark: SparkSession): Array[Cell] = {
    import spark.implicits._
    val cz = cellZoom
    val pz = prevZoom
    val keep = restrictTo
    tiles
      // refinement passes take only tiles FINER than the previous grain:
      // a tile at z ≤ prevZoom was already its own (unsplittable) cell, and
      // its aligned start can collide with a hot cell's — without the z
      // guard it would be double-counted
      .filter(t => keep.forall(s => t.z > pz && s.contains(cellSpan(t.z, t.tx, t.ty, pz)._1)))
      .map { t =>
        val (s, e) = cellSpan(t.z, t.tx, t.ty, cz)
        ((s, e, math.min(t.z, cz)), t.mvt.length.toLong)
      }
      .groupByKey(_._1)
      .mapValues(_._2).reduceGroups(_ + _)
      .collect()
      .map { case ((s, e, z), w) => Cell(s, e, w, z) }
  }

  /** Observed histogram with quadtree refinement: start at `baseZoom`,
    * split any cell heavier than totalWeight/nParts by re-aggregating its
    * subtree 3 zoom levels finer, up to z14 (tile grain — irreducible). */
  def adaptiveHistogram(tiles: Dataset[MvtTile], nParts: Int, baseZoom: Int = 7)(
      implicit spark: SparkSession): Array[Cell] = {
    var cells = pass(tiles, baseZoom, None, baseZoom)
    val total = cells.map(_.weight).sum
    val target = math.max(1L, total / math.max(1, nParts))
    var zoom = baseZoom
    while (zoom < AlignZoom && cells.exists(c => c.weight > target && c.zoom == zoom)) {
      val hot = cells.filter(c => c.weight > target && c.zoom == zoom)
      val hotStarts = hot.map(_.start).toSet
      val next = math.min(AlignZoom, zoom + 3)
      val refined = pass(tiles, next, Some(hotStarts), zoom)
      cells = cells.filterNot(c => hotStarts.contains(c.start) && c.zoom == zoom) ++ refined
      zoom = next
    }
    cells.sortBy(_.start)
  }

  /** Weighted-quantile boundaries: bounds(i) = inclusive aligned END of
    * range i (the last range is open). Each range ≈ totalWeight/nParts. */
  def boundaries(cells: Array[Cell], nParts: Int): Array[Long] = {
    require(nParts >= 1)
    if (cells.isEmpty || nParts == 1) return Array.empty
    val total = cells.map(_.weight).sum
    val target = math.max(1L, total / nParts)
    val bounds = Array.newBuilder[Long]
    var acc = 0L
    var emitted = 0
    cells.foreach { c =>
      acc += c.weight
      if (acc >= target && emitted < nParts - 1) {
        bounds += c.end
        acc = 0L
        emitted += 1
      }
    }
    bounds.result()
  }

  /** Range id of an aligned tile key (binary search over the small,
    * broadcast boundary array). */
  def rangeId(key: Long, bounds: Array[Long]): Int = {
    var lo = 0; var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (bounds(mid) < key) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** Identity placement: range id IS the partition — hash placement would
    * merge some ranges and empty others (balls-in-bins), defeating the
    * sizing. This is the one deliberate RDD drop-down in the export path:
    * the Dataset API cannot express an exact custom partitioner. */
  private final class IdentityPartitioner(n: Int) extends org.apache.spark.Partitioner {
    override def numPartitions: Int = n
    override def getPartition(key: Any): Int = key.asInstanceOf[Int]
  }

  /** The export stream, RANGE-partitioned into `nParts` contiguous,
    * byte-balanced neighborhoods (the observe passes re-read the tile
    * stream — cache `tiles` if the upstream is expensive). */
  def balanced(tiles: Dataset[MvtTile], nParts: Int, baseZoom: Int = 7)(
      implicit spark: SparkSession): Dataset[MvtTile] = {
    import spark.implicits._
    val bounds = boundaries(adaptiveHistogram(tiles, nParts, baseZoom), nParts)
    val bc = spark.sparkContext.broadcast(bounds)
    val placed = tiles.rdd
      .map(t => (rangeId(alignedKey(t.z, t.tx, t.ty), bc.value), t))
      .partitionBy(new IdentityPartitioner(bounds.length + 1))
      .values
    spark.createDataset(placed)
  }
}
