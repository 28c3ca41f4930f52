package graft.agg

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Schemas.{GlobalPixel, UserPixel}

/**
 * Heatmap aggregation: per-user pixel accumulation and the global
 * k-anonymity layer.
 *
 * Re-expresses the reference's per-pixel merge + global tile rebuild
 * (`/root/reference/src/HeatMap.Tiles/Diffs/HeatMapExtensions.cs:49-131`,
 * `Worker.cs:167-222`) as two hash aggregations:
 *
 *   user grain:   groupBy(user_id, gx, gy).sum(trips)          (A2/A3)
 *   global grain: groupBy(gx, gy).agg(count(*), sum(trips))
 *                 .where(users >= k)                           (A4/A5/F7)
 *
 * The count-distinct is EXACT (the reference enumerates real user sets, no
 * sketches) but costs no distinct-aggregation: after the user-grain
 * pre-aggregate each (pixel, user) appears exactly once, so a plain
 * count(*) per pixel IS the distinct user count. That turns the classic
 * hot-cell count-distinct skew problem into two well-partitioned partial
 * aggregations — the scale-out answer to the north rule's "salting for hot
 * urban cells": keys are pixel-grain (tile × 512²), so no single reducer
 * key can concentrate an urban core; Spark's partial aggregation performs
 * the map-side combine, and AQE rebalances stragglers.
 */
object HeatmapAgg {
  val KAnonymity = 3 // MIN_USERS — Worker.cs:204-216, Program.cs:34

  /** A2/A3: accumulate each user's pixels (saturating at u32 max as the
    * reference does on merge — Diffs/HeatMapExtensions.cs:113-117). */
  def userGrain(pixels: Dataset[UserPixel])(implicit spark: SparkSession): Dataset[UserPixel] = {
    import spark.implicits._
    pixels
      .groupBy($"user_id", $"gx", $"gy")
      .agg(least(sum($"trips"), lit(graft.core.Codec.U32Max)).as("trips"))
      .as[UserPixel]
  }

  /** A4/F7: exact distinct users + trip sum per pixel, k-anonymity HAVING. */
  def globalGrain(userPixels: Dataset[UserPixel], k: Int = KAnonymity)(
      implicit spark: SparkSession): Dataset[GlobalPixel] = {
    import spark.implicits._
    userPixels
      .groupBy($"gx", $"gy")
      .agg(count(lit(1)).as("users"), sum($"trips").as("trips"))
      .where($"users" >= k)
      .select(lit(graft.raster.Rasterize.Zoom).as("z"), $"gx", $"gy", $"users", $"trips")
      .as[GlobalPixel]
  }

  /** Single-exchange z14 layer from raw raster output (user_id, pkey,
    * trips): Catalyst plans the exact count-distinct as ONE hash exchange
    * on pkey with a map-side partial keyed (pkey, user) — half the shuffle
    * volume of the explicit user-grain → global-grain cascade, same exact
    * result (proved equal in HeatmapPipelineSpec). The user-grain
    * saturating clamp (A3) is not applicable on this path: single-batch
    * trip counts cannot approach 2^32 (documented divergence of the fused
    * form; the explicit cascade keeps the clamp). */
  def globalGrainFused(rasterPixels: org.apache.spark.sql.Dataset[graft.model.Schemas.PixelVisit],
                       k: Int = KAnonymity)(
      implicit spark: SparkSession): Dataset[GlobalPixel] = {
    import spark.implicits._
    rasterPixels.toDF()
      .groupBy($"pkey")
      .agg(countDistinct($"user_id").as("users"), sum($"trips").as("trips"))
      .where($"users" >= k)
      .select(lit(graft.raster.Rasterize.Zoom).as("z"),
        shiftrightunsigned($"pkey", 32).as("gx"),
        $"pkey".bitwiseAND(lit(graft.core.Codec.U32Max)).as("gy"),
        $"users", $"trips")
      .as[GlobalPixel]
  }

  /** Two-phase SALTED variant of the k-anonymity layer for hot-key regimes
    * (north rule: "explicit salting for hot urban cells"). Phase 1 groups on
    * (pkey, salt = user_id % S) — splitting any single hot pixel's rows
    * across S reducers — and pre-aggregates to (pixel, user) grain inside
    * each salt; because the salt is a FUNCTION of user_id, a user never
    * spans salts, so phase 2's count over (pixel, salt-partials) is still
    * the exact distinct-user count. Proven equal to the unsalted plan in
    * HeatmapAggSpec. Use when a cell's row count dwarfs the average (urban
    * cores at planetary scale); the unsalted fused plan already splits by
    * (pkey, user) so salting matters when single (pixel, user) pairs repeat
    * massively across tracks. */
  def globalGrainSalted(rasterPixels: org.apache.spark.sql.Dataset[graft.model.Schemas.PixelVisit],
                        k: Int = KAnonymity, salts: Int = 16)(
      implicit spark: SparkSession): Dataset[GlobalPixel] = {
    import spark.implicits._
    val phase1 = rasterPixels.toDF()
      .withColumn("salt", pmod(col("user_id"), lit(salts)))
      .groupBy($"pkey", $"salt", $"user_id")
      .agg(sum($"trips").as("trips"))
    val phase2 = phase1
      .groupBy($"pkey", $"salt")
      .agg(count(lit(1)).as("users_part"), sum($"trips").as("trips_part"))
    phase2
      .groupBy($"pkey")
      .agg(sum($"users_part").as("users"), sum($"trips_part").as("trips"))
      .where($"users" >= k)
      .select(lit(graft.raster.Rasterize.Zoom).as("z"),
        shiftrightunsigned($"pkey", 32).as("gx"),
        $"pkey".bitwiseAND(lit(graft.core.Codec.U32Max)).as("gy"),
        $"users", $"trips")
      .as[GlobalPixel]
  }

  /** Single-exchange z14 via the native TypedImperativeAggregate
    * (graft.functions.UserTripsAgg): the user set rides in the partial
    * buffer, so there is exactly ONE hash exchange on the pixel key —
    * vs two for the built-in countDistinct plan. Proven equal to the other
    * plans in HeatmapAggSpec; exchange count asserted in PlanQualitySpec. */
  def globalGrainNative(rasterPixels: org.apache.spark.sql.Dataset[graft.model.Schemas.PixelVisit],
                        k: Int = KAnonymity)(
      implicit spark: SparkSession): Dataset[GlobalPixel] = {
    import spark.implicits._
    rasterPixels.toDF()
      .groupBy($"pkey")
      .agg(graft.functions.UserTripsFunctions.userTrips(spark, $"user_id", $"trips").as("ut"))
      .where($"ut.users" >= k)
      .select(lit(graft.raster.Rasterize.Zoom).as("z"),
        shiftrightunsigned($"pkey", 32).as("gx"),
        $"pkey".bitwiseAND(lit(graft.core.Codec.U32Max)).as("gy"),
        $"ut.users".as("users"), $"ut.trips".as("trips"))
      .as[GlobalPixel]
  }

  /** Single-exchange z14 at TILE grain — the scale plan the flagship runs.
    *
    * `globalGrainNative` already has one exchange, but it exchanges one row
    * per distinct (pixel) per map partition; with tracks landing randomly
    * every partition covers most hot pixels, so the exchange still carries
    * millions of rows. Grouping by tile (`Rasterize.tileVisits` +
    * `TileUsersAgg`) exchanges one compact binary buffer per
    * (map partition × tile) — row count drops by the pixels-per-tile factor
    * (~500× at sf0.1) and the memory path (row headers, hashing, AQE stats)
    * with it. Same exact semantics: distinct users + trip sums per pixel,
    * k-anonymity HAVING (proved equal to the fused plan in HeatmapAggSpec).
    * Skew posture: the hottest urban tile is ONE key whose merges are
    * buffer unions (cheap); with 2^28 tiles at z14, keys are plentiful and
    * AQE rebalances reducers. */
  def globalGrainTiled(tiles: org.apache.spark.sql.Dataset[graft.model.Schemas.TileVisit],
                       k: Int = KAnonymity,
                       zoom: Int = graft.raster.Rasterize.Zoom,
                       resolution: Int = graft.raster.Rasterize.Resolution)(
      implicit spark: SparkSession): Dataset[GlobalPixel] =
    cellsToPixels(tileCells(tiles), k, zoom, resolution)

  /** The tile-grain aggregation itself: one exchange keyed by tkey, one row
    * per tile out. The flagship caches THIS relation and derives both the
    * z14 layer (`cellsToPixels`, narrow) and the pyramid
    * (`Pyramid.lowerLevelsFromTiles`, tile-local pre-agg) from it. */
  def tileCells(tiles: org.apache.spark.sql.Dataset[graft.model.Schemas.TileVisit])(
      implicit spark: SparkSession): Dataset[graft.model.Schemas.TileCells] = {
    import spark.implicits._
    tiles.toDF()
      .groupBy($"tkey")
      .agg(graft.functions.TileUsersFunctions.tileUsers(spark, $"user_id", $"pixels").as("cells"))
      .as[graft.model.Schemas.TileCells]
  }

  /** Hot-tile guard: the STRIPED tile aggregation. `tileCells` concentrates
    * one buffer per tile on a single reducer — fine for 2^28 z14 tiles in
    * general, but a planetary urban core with millions of distinct users
    * makes that one buffer O(distinct (pixel, user) pairs). Striping splits
    * the key to (tkey, user_id % stripes): each stripe's buffer holds only
    * its users' pairs (≈ pairs/stripes), and because a user lives in
    * EXACTLY one stripe, per-pixel distinct-user counts ADD across stripes
    * — the merge is an exact sum, not an approximation (same argument as
    * `globalGrainSalted`; equality proven in HeatmapAggSpec, including a
    * pathological one-tile × 10^5-user case with buffer telemetry).
    * Cost: one extra (small) exchange of per-stripe cell arrays. */
  def tileCellsStriped(tiles: org.apache.spark.sql.Dataset[graft.model.Schemas.TileVisit],
                       stripes: Int)(
      implicit spark: SparkSession): Dataset[graft.model.Schemas.TileCells] = {
    import spark.implicits._
    if (stripes <= 1) return tileCells(tiles)
    val perStripe = tiles.toDF()
      .withColumn("stripe", pmod($"user_id", lit(stripes)))
      .groupBy($"tkey", $"stripe")
      .agg(graft.functions.TileUsersFunctions.tileUsers(spark, $"user_id", $"pixels").as("cells"))
      .select($"tkey", $"cells")
      .as[(Long, Array[graft.model.Schemas.Cell])]
    perStripe
      .groupByKey(_._1)
      .mapGroups { (tkey, it) =>
        // merge ≤ `stripes` stripe-disjoint cell arrays: users/trips sum per pixel
        val users = new scala.collection.mutable.LongMap[Long]()
        val trips = new scala.collection.mutable.LongMap[Long]()
        it.foreach { case (_, cells) =>
          cells.foreach { c =>
            users.update(c.pix.toLong, users.getOrElse(c.pix.toLong, 0L) + c.users)
            trips.update(c.pix.toLong, trips.getOrElse(c.pix.toLong, 0L) + c.trips)
          }
        }
        val out = new Array[graft.model.Schemas.Cell](users.size)
        var i = 0
        users.foreach { case (pix, u) =>
          out(i) = graft.model.Schemas.Cell(pix.toInt, u, trips(pix)); i += 1
        }
        java.util.Arrays.sort(out, Ordering.by((c: graft.model.Schemas.Cell) => c.pix))
        graft.model.Schemas.TileCells(tkey, out)
      }
  }

  /** Size-triggered stripe selection: bound any single tile buffer to
    * roughly `maxUsersPerStripe` distinct users in the worst (all users on
    * one tile) case. 1 stripe — the plain single-exchange plan — until the
    * corpus is big enough to need splitting; capped so the stripe exchange
    * itself stays small. */
  def stripesFor(distinctUsers: Long, maxUsersPerStripe: Long = 200000L): Int =
    math.min(64L, math.max(1L, (distinctUsers + maxUsersPerStripe - 1) / maxUsersPerStripe)).toInt

  /** Narrow explode of aggregated tiles into the pixel relation, with the
    * k-anonymity HAVING (no shuffle — cells are already exact). */
  def cellsToPixels(tc: Dataset[graft.model.Schemas.TileCells],
                    k: Int = KAnonymity,
                    zoom: Int = graft.raster.Rasterize.Zoom,
                    resolution: Int = graft.raster.Rasterize.Resolution)(
      implicit spark: SparkSession): Dataset[GlobalPixel] = {
    import spark.implicits._
    tc.toDF()
      .select($"tkey", explode($"cells").as("c"))
      .where($"c.users" >= k)
      .select(lit(zoom).as("z"),
        (shiftrightunsigned($"tkey", 32) * resolution +
          floor($"c.pix" / resolution)).cast("long").as("gx"),
        ($"tkey".bitwiseAND(lit(graft.core.Codec.U32Max)) * resolution +
          $"c.pix" % resolution).cast("long").as("gy"),
        $"c.users".cast("long").as("users"), $"c.trips".cast("long").as("trips"))
      .as[GlobalPixel]
  }

  /** tile→users inverted index (S13, Worker.cs:298-338): distinct users per
    * z14 tile as a sorted array — usually fused away into the count-distinct
    * aggregate, materialized here as the library surface. */
  def tileUsersIndex(rasterPixels: org.apache.spark.sql.Dataset[graft.model.Schemas.PixelVisit])(
      implicit spark: SparkSession): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val res = graft.raster.Rasterize.Resolution
    rasterPixels.toDF()
      .select(floor(shiftrightunsigned($"pkey", 32) / res).cast("long").as("tx"),
        floor($"pkey".bitwiseAND(lit(graft.core.Codec.U32Max)) / res).cast("long").as("ty"),
        $"user_id")
      .groupBy($"tx", $"ty")
      .agg(sort_array(collect_set($"user_id")).as("users"))
  }

  /** Packed export form: u64 = users << 32 | trips (Encoder.cs:10-13) —
    * applied only at the boundary to avoid the carry hazard of packed sums. */
  def packed(global: DataFrame): DataFrame =
    global.withColumn("packed",
      shiftleft(col("users"), 32).bitwiseOR(col("trips").bitwiseAND(lit(graft.core.Codec.U32Max))))
}
