package graft.geo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Slippy

/**
 * Spatial joins over the tile-cell index (north rule: H3/S2-style cell
 * encoding, point-in-polygon, kNN, raster↔vector overlay).
 *
 * The cell system IS the reference's own quadtree: cellId =
 * ToLocalId(WorldToTile(lon, lat, z), z) (`TileStatic.cs:145-168`) — the
 * same role S2/H3 play, with the same math the tiling pipeline uses, so
 * index and data never disagree.
 *
 * Scale shape: the polygon side is covered with z-cells once (tiny,
 * broadcast); the point side gets a cell column (narrow map); the join is
 * an equi-join on cell with an exact geometric refine predicate — no
 * theta-join, no cross product, pruned to the cover.
 */
object SpatialJoins {
  val CellZoom = 14

  final case class Region(region_id: Long, left: Double, bottom: Double, right: Double, top: Double)

  /** Cell cover of an axis-aligned region (the reference's tile polygons,
    * TileStatic.cs:235-268, are exactly these rectangles). */
  def coverCells(r: Region, zoom: Int = CellZoom): Seq[(Long, Long)] =
    Slippy.tilesFor(r.left, r.top, r.right, r.bottom, zoom)
      .map { case (tx, ty) => (r.region_id, Slippy.toLocalId(tx, ty, zoom)) }
      .toSeq

  /** Points must carry (lon, lat); returns the input + cell column —
    * computed by the codegen'd native expression (no UDF SerDe boundary). */
  def withCell(points: DataFrame, zoom: Int = CellZoom)(implicit spark: SparkSession): DataFrame =
    points.withColumn("cell",
      graft.functions.SlippyFunctions.slippyCell(spark, col("lon"), col("lat"), zoom))

  /** Point-in-polygon join: cell-cover equi-join + exact refine.
    * Output: one row per (point, containing region). */
  def pointInRegion(points: DataFrame, regions: Seq[Region], zoom: Int = CellZoom)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val cover = regions.flatMap(r => coverCells(r, zoom).map { case (id, c) => (id, c) })
      .toDF("region_id", "cell")
    val regionDf = regions.toDF()
    withCell(points, zoom)
      .join(broadcast(cover), "cell")                       // index join: prunes to cover
      .join(broadcast(regionDf), "region_id")               // fetch exact bounds
      .where(col("lon") >= col("left") && col("lon") <= col("right") &&
        col("lat") >= col("bottom") && col("lat") <= col("top")) // exact refine
      .drop("left", "bottom", "right", "top")
  }

  /** Point-in-bbox via the NAIVE interval-predicate spelling (`lon BETWEEN
    * left AND right AND lat BETWEEN bottom AND top`, no cell index), planned
    * by the injected `graft.plans.RangeJoinStrategy` as a broadcast
    * interval-tree join instead of the BroadcastNestedLoopJoin stock Spark
    * produces for this shape. Same output contract as [[pointInRegion]]
    * (one row per (point, containing region)); complements the cell-cover
    * path — this one needs NO precomputed cover and indexes the longitude
    * interval, refining latitude as the residual. */
  def rangeJoinBBox(points: DataFrame, regions: Seq[Region])(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    graft.plans.RangeJoin.register(spark)
    val r = regions.toDF()
    points.join(r,
      points("lon") >= r("left") && points("lon") <= r("right") &&
        points("lat") >= r("bottom") && points("lat") <= r("top"))
      .drop("left", "bottom", "right", "top")
  }

  /** A polygonal region: closed ring of (lon, lat), last point == first
    * (the shape `Slippy.toPolygon` produces; arbitrary simple rings OK). */
  final case class PolyRegion(region_id: Long, ring: Array[Array[Double]])

  /** Even-odd ray-casting containment (pure kernel). Tie-break, stated
    * precisely: the +x ray uses a STRICT `lon < xCross` test with a
    * half-open `(y1 > lat) != (y2 > lat)` span, so an edge the point lies
    * exactly ON never toggles — the point is inside iff an odd number of
    * edges lie STRICTLY to its right. Consequences: a point on a vertical
    * edge is inside iff the region is to the right of it (left boundary in,
    * right boundary out); bottom boundary in, top boundary out (half-open
    * span). Two regions sharing a border therefore claim a boundary point
    * at most once — the property the oracle tie-break consistency relies
    * on. */
  def pointInRing(lon: Double, lat: Double, ring: Array[Array[Double]]): Boolean = {
    var inside = false
    var i = 0
    val n = ring.length
    while (i < n - 1) {
      val x1 = ring(i)(0); val y1 = ring(i)(1)
      val x2 = ring(i + 1)(0); val y2 = ring(i + 1)(1)
      if ((y1 > lat) != (y2 > lat)) {
        val xCross = x1 + (lat - y1) / (y2 - y1) * (x2 - x1)
        if (lon < xCross) inside = !inside
      }
      i += 1
    }
    inside
  }

  /** Cell cover of a polygon's bounding box (conservative superset —
    * exactness comes from the ray-cast refine). */
  def coverCellsPolygon(p: PolyRegion, zoom: Int = CellZoom): Seq[(Long, Long)] = {
    val lons = p.ring.map(_(0)); val lats = p.ring.map(_(1))
    Slippy.tilesFor(lons.min, lats.max, lons.max, lats.min, zoom)
      .map { case (tx, ty) => (p.region_id, Slippy.toLocalId(tx, ty, zoom)) }
      .toSeq
  }

  /** Point-in-POLYGON join for arbitrary simple rings: bbox cell-cover
    * equi-join prunes candidates (broadcast — regions are the small side),
    * then the exact ray-cast refine runs as a typed filter against the
    * broadcast ring table. Same plan shape as the rectangular
    * `pointInRegion`; only the refine predicate changes (the reference's
    * own region polygons, TileStatic.cs:235-268, are rectangles — this is
    * the general form the north star's region joins need).
    * Output: (pid, lon, lat, cell, region_id). */
  def pointInPolygon(points: DataFrame, regions: Seq[PolyRegion], zoom: Int = CellZoom)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val cover = regions.flatMap(r => coverCellsPolygon(r, zoom))
      .toDF("region_id", "cell")
    val rings = spark.sparkContext.broadcast(
      regions.map(r => r.region_id -> r.ring).toMap)
    withCell(points, zoom)
      .join(broadcast(cover), "cell")
      .select(col("pid").cast("long"), col("lon"), col("lat"),
        col("cell"), col("region_id").cast("long"))
      .as[(Long, Double, Double, Long, Long)]
      .filter { t => pointInRing(t._2, t._3, rings.value(t._5)) }
      .toDF("pid", "lon", "lat", "cell", "region_id")
  }

  /** kNN: for each query point, the k nearest data points by squared
    * euclidean degree distance. Brute-force window baseline (exact); the
    * cell-ring candidate variant must reproduce exactly this output. */
  def knnBruteForce(points: DataFrame, queries: Seq[(Long, Double, Double)], k: Int)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val q = queries.toDF("qid", "qlon", "qlat")
    val dist2 = (col("lon") - col("qlon")) * (col("lon") - col("qlon")) +
      (col("lat") - col("qlat")) * (col("lat") - col("qlat"))
    val w = Window.partitionBy(col("qid")).orderBy(col("dist2"), col("pid"))
    points.crossJoin(broadcast(q))
      .withColumn("dist2", dist2)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select(col("qid"), col("rn"), col("pid"))
  }

  /** kNN scale path: restrict candidates to cells within `ring` tiles of the
    * query's cell before the window — exact as long as the ring radius
    * covers the true k-th neighbor (caller grows ring until counts reach k). */
  def knnCellRing(points: DataFrame, queries: Seq[(Long, Double, Double)], k: Int,
                  ring: Int = 2, zoom: Int = CellZoom, preIndexed: Boolean = false)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val candCells = queries.flatMap { case (qid, qlon, qlat) =>
      val (cx, cy) = Slippy.worldToTile(qlon, qlat, zoom)
      for {
        dx <- -ring to ring
        dy <- -ring to ring
        x = cx + dx if x >= 0
        y = cy + dy if y >= 0
      } yield (qid, qlon, qlat, Slippy.toLocalId(x, y, zoom))
    }.toDF("qid", "qlon", "qlat", "cell")
    val dist2 = (col("lon") - col("qlon")) * (col("lon") - col("qlon")) +
      (col("lat") - col("qlat")) * (col("lat") - col("qlat"))
    val w = Window.partitionBy(col("qid")).orderBy(col("dist2"), col("pid"))
    (if (preIndexed) points else withCell(points, zoom))
      .join(broadcast(candCells), "cell")
      .withColumn("dist2", dist2)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select(col("qid"), col("rn"), col("pid"), col("dist2"))
  }

  /**
   * Exact kNN via adaptive cell-ring expansion: start with a small ring of
   * cells around each query, grow it until (a) every query has ≥ k
   * candidates and (b) the k-th candidate's distance is provably covered by
   * the ring (no closer point can live outside it). Returns exactly
   * `knnBruteForce`'s answer while only ever scanning candidate cells — the
   * plan that survives a 10^12-point table, where the brute-force
   * cross-join never finishes.
   */
  def knnExact(points: DataFrame, queries: Seq[(Long, Double, Double)], k: Int,
               zoom: Int = CellZoom)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val indexed = withCell(points, zoom)
    indexed.persist()
    try {
      // termination cap: a ring of 2^zoom tiles covers the whole world grid,
      // so a larger ring can never add candidates. If coverage still isn't
      // provable there (e.g. the table has < k rows), fall back to the
      // brute-force scan — correct by definition, and the candidate set at
      // that point IS the whole table anyway.
      val maxRing = 1 << zoom
      var ring = 2
      var result: Option[DataFrame] = None
      while (result.isEmpty && ring <= maxRing) {
        // materialize the ring's candidate top-k ONCE (eager checkpoint):
        // the verification aggregate below AND the returned result both
        // read the materialized rows — un-checkpointed, the caller's later
        // action re-ran the whole candidate join + window a second time
        // after `indexed` was already unpersisted (a full extra pass over
        // the points table per invocation). Callers release via
        // Dedup.releaseCheckpoint, the shared checkpoint-result contract.
        val cand = knnCellRing(indexed, queries, k, ring, zoom, preIndexed = true)
          .localCheckpoint(true)
        // verification: per query, k candidates found and the k-th distance
        // is within the radius the ring provably covers
        val kth = cand.groupBy($"qid")
          .agg(count(lit(1)).as("n"), max($"dist2").as("maxd2"))
          .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
        val covered = queries.forall { case (qid, qlon, qlat) =>
          kth.get(qid).exists { case (n, maxd2) =>
            val (tx, ty) = Slippy.worldToTile(qlon, qlat, zoom)
            val (left, top, right, bottom) = Slippy.boxXY(zoom, tx, ty)
            // the ring guarantees coverage of a disc whose radius is the
            // ring width times the smaller cell dimension, measured from the
            // query's own cell boundary — conservative lower bound
            val safe = (ring.toDouble - 1) * math.min(right - left, top - bottom)
            n >= k && math.sqrt(maxd2) <= safe
          }
        }
        if (covered) result = Some(cand.select($"qid", $"rn", $"pid"))
        else {
          graft.dedup.Dedup.releaseCheckpoint(cand) // failed ring: free its blocks now
          ring *= 2
        }
      }
      result.getOrElse(knnBruteForce(indexed, queries, k))
    } finally indexed.unpersist()
  }

  /** Raster↔vector overlay: heatmap pixels ⋈ rasterized geometry pixels on
    * the global pixel key — a plain equi-join once both sides are pixel
    * relations. */
  def rasterVectorOverlay(heatPixels: DataFrame, tracePixels: DataFrame): DataFrame =
    heatPixels.join(tracePixels, Seq("gx", "gy"), "inner")
}
