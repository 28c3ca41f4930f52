package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.agg.HeatmapAgg
import graft.io.TileStore
import graft.model.Schemas.Track
import graft.raster.Rasterize

/**
 * Incrementally-maintained heatmap (the reference's service loop, SURVEY.md
 * §3.1, recast as dirty-tile MERGE maintenance):
 *
 * per id-window batch (Worker.cs:139-165):
 *   1. skip if the window is already committed (idempotent resume — fixes
 *      the reference's at-least-once double-apply, Worker.cs:122-129)
 *   2. rasterize the batch → delta user-pixels
 *   3. MERGE delta into the persistent user_pixels relation
 *      (full-outer + saturating add = Diffs/HeatMapExtensions.cs:49-131) —
 *      reading ONLY the dirty tile-bucket partitions (directory pruning)
 *   4. recompute the global z14 layer ONLY for dirty tiles
 *      (Worker.cs:167-222), splice into the dirty buckets
 *   5. rebuild each pyramid level z−1 from level z's SPLICED rows restricted
 *      to the dirty subtree (HeatMapExtensions.cs:148-214 — the reference's
 *      own level-by-level parent rebuild): per level the scan is bounded by
 *      the children of the dirty parents, partition-pruned to their buckets,
 *      never the whole level
 *   6. commit atomically with lineage metrics: only the DIRTY partitions of
 *      user_pixels/global are written; clean partitions carry forward into
 *      the new version as hardlinks (TileStore.Partial)
 *
 * Every pixel-grain step is keyed/partitioned; the dirty-TILE set is the
 * one deliberately driver-side structure — bounded by the id-window
 * (maxContributions × tiles-per-track), the same contract as the
 * reference's in-memory HashSet (Worker.cs:99-103) — so at 10^12-row scale
 * the per-batch scan AND write cost is bounded by the touched-tile subtree
 * × bucket granularity (TileStore.Buckets), not the world.
 */
object Incremental {
  val Res = Rasterize.Resolution

  /** Dirty-bucket fraction above which the pyramid rebuild switches from
    * the bounded level-by-level cascade to the single fused ancestor-
    * explode: past this point most of the store is dirty anyway, so one
    * wide exchange beats 14 bounded jobs (sandbox backfill batches land
    * here; planetary steady-state trickle stays far below it). */
  val FusedCutover = 0.3

  private def allBuckets: Seq[Int] = 0 until TileStore.Buckets

  final case class BatchResult(version: Long, skipped: Boolean)

  private def tileOf(gxCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    floor(gxCol / Res).cast("long")

  private def pbOf(df: DataFrame): DataFrame =
    df.withColumn("pb", TileStore.bucketCol(tileOf(col("gx")), tileOf(col("gy"))))

  /** F8 pre-check (Worker.cs:178-179): the (tx, ty) tiles of `dirtyRows`
    * (user-pixel rows carrying tx/ty columns) whose EXACT distinct user
    * count reaches k — only their rows are worth the pixel-grain rebuild;
    * a sub-k tile's pixels all fail the k-anonymity HAVING regardless.
    * Exact, not approximate: a tile with exactly k users must survive. */
  def eligibleTiles(dirtyRows: DataFrame, k: Int): DataFrame =
    dirtyRows
      .groupBy("tx", "ty")
      .agg(countDistinct(col("user_id")).as("tile_users"))
      .where(col("tile_users") >= k)
      .select("tx", "ty")

  /** Merge batch delta into persistent user pixels: full-outer sum with the
    * reference's u32 saturation. */
  def mergeUserPixels(existing: Option[DataFrame], delta: DataFrame): DataFrame = {
    val d = delta.groupBy("user_id", "gx", "gy").agg(sum("trips").as("trips"))
    existing match {
      case None => d
      case Some(e) =>
        e.withColumnRenamed("trips", "trips_old")
          .join(d.withColumnRenamed("trips", "trips_new"), Seq("user_id", "gx", "gy"), "full_outer")
          .select(col("user_id"), col("gx"), col("gy"),
            least(coalesce(col("trips_old"), lit(0L)) + coalesce(col("trips_new"), lit(0L)),
              lit(graft.core.Codec.U32Max)).as("trips"))
    }
  }

  /** Process one id-window batch of tracks. Returns the committed version
    * (or skipped=true when the window was already committed). */
  def processBatch(store: TileStore, tracks: Dataset[Track], fromId: Long, toId: Long,
                   k: Int = HeatmapAgg.KAnonymity)(
      implicit spark: SparkSession): BatchResult =
    applyBatch(store, tracks.where(col("contribution_id") > fromId && col("contribution_id") <= toId),
      fromId, toId, k)

  /** Streaming entry: commit keyed by the micro-batch id (exactly-once on
    * crash-replay — Structured Streaming re-delivers the same batchId with
    * the same data). */
  def processMicroBatch(store: TileStore, batch: Dataset[Track], batchId: Long,
                        k: Int = HeatmapAgg.KAnonymity)(
      implicit spark: SparkSession): BatchResult =
    applyBatch(store, batch, batchId, batchId, k)

  private def applyBatch(store: TileStore, batch: Dataset[Track], fromId: Long, toId: Long,
                         k: Int)(implicit spark: SparkSession): BatchResult = {
    if (store.committedBatches.contains((fromId, toId)))
      return BatchResult(store.currentVersion, skipped = true)

    import spark.implicits._
    val delta = HeatmapAgg.userGrain(Rasterize.userPixels(batch)).toDF()
    delta.persist()

    // The per-batch dirty set is bounded by the id-window (maxContributions
    // × tiles-per-track), exactly the reference's in-memory HashSet
    // (Worker.cs:99-103) — collect it once; per-level ancestor sets and
    // bucket sets derive on the driver.
    val dirtySet: Set[(Long, Long)] = delta
      .select(tileOf(col("gx")).as("tx"), tileOf(col("gy")).as("ty")).distinct()
      .as[(Long, Long)].collect().toSet
    val dirtyByZ: Array[Set[(Long, Long)]] = {
      val arr = new Array[Set[(Long, Long)]](15)
      arr(14) = dirtySet
      var z = 13
      while (z >= 0) {
        arr(z) = arr(z + 1).map { case (tx, ty) => (tx / 2, ty / 2) }
        z -= 1
      }
      arr
    }
    def bucketsOf(s: Set[(Long, Long)]): Seq[Int] =
      s.map { case (tx, ty) => TileStore.bucketOf(tx, ty) }.toSeq.distinct.sorted
    def tilesDf(s: Set[(Long, Long)]): DataFrame =
      s.toSeq.sorted.toDF("tx", "ty")
    def withTiles(df: DataFrame): DataFrame =
      df.withColumn("tx", tileOf(col("gx"))).withColumn("ty", tileOf(col("gy")))

    // 3. merge user pixels — ONLY the dirty buckets are read (partition-
    // pruned: the delta's keys all live in dirty tiles, so clean buckets
    // cannot change) and only they are rewritten; the rest hardlink forward.
    // localCheckpoint truncates logical lineage for the splice cascade below.
    val dirtyB = bucketsOf(dirtySet)
    val oldUpDirty = store.readBuckets("user_pixels", Some(userPixelsSchemaP), dirtyB)
      .map(_.select("user_id", "gx", "gy", "trips"))
    val merged = mergeUserPixels(oldUpDirty, delta).localCheckpoint(false)

    // 4. dirty z14 tiles: rebuild the global layer for exactly those tiles
    // from the merged (dirty-bucket) user pixels. Small (bounded by the
    // dirty subtree) — checkpoint eagerly so the level cascade below starts
    // from materialized rows, not a re-runnable plan.
    //
    // F8 (Worker.cs:178-179): tile-level user PRE-CHECK first — a dirty
    // tile whose distinct user count is below k cannot contribute any
    // pixel (a pixel's user set ⊆ its tile's), so its rows skip the
    // pixel-grain rebuild entirely; its absence from the rebuilt output IS
    // its deletion, exactly like the unfiltered HAVING. The pre-check
    // exchanges at (tile, user) grain (map-side partial dedup), ≪ pixel
    // grain — a win exactly in the TRICKLE regime, where most touched
    // tiles are sparse and most rows never reach the expensive aggregate.
    // In the backfill regime (most of the store dirty, tiles dense) the
    // reference's per-tile in-memory check is free but a distributed
    // pre-agg is a whole extra pass that filters almost nothing —
    // measured +25 % batch latency at sf0.01 backfill — so it gates on
    // the SAME dirty-fraction switch as the pyramid rebuild below.
    val dirtyFraction = dirtyB.size.toDouble / TileStore.Buckets
    val preCheckOn = dirtyFraction <= FusedCutover && k > 1
    val dirtyRows = merged
      .transform(withTiles)
      .join(broadcast(tilesDf(dirtySet)), Seq("tx", "ty"), "left_semi")
    val rebuildRows =
      if (preCheckOn)
        dirtyRows.join(broadcast(eligibleTiles(dirtyRows, k)), Seq("tx", "ty"), "left_semi")
      else dirtyRows
    val dirtyZ14 = rebuildRows
      .groupBy("gx", "gy")
      .agg(countDistinct(col("user_id")).as("users"), sum("trips").as("trips"))
      .where(col("users") >= k)
      .select(lit(14).as("z"), col("gx"), col("gy"), col("users"), col("trips"))
      .localCheckpoint(false) // lazy: materialized by the first consumer, reused after

    // old level-z rows, partition-pruned to the given buckets
    def oldLevel(z: Int, buckets: Seq[Int]): DataFrame =
      store.readBuckets("global", Some(globalSchemaP), buckets, Some(z))
        .map(_.where(col("z") === z).select("z", "gx", "gy", "users", "trips"))
        .getOrElse(emptyGlobal)

    // 5. parent rebuild for levels 13..0, ADAPTIVE by dirty fraction:
    //
    //   steady-state trickle (dirty buckets ≤ FusedCutover of the store) —
    //   level-by-level bounded cascade (HeatMapExtensions.cs:148-214):
    //   level z−1's dirty parents recompute from level z's SPLICED rows
    //   restricted to the children of those parents — old rows partition-
    //   pruned + semi-joined to the (≤4×|dirty|) child set, plus the just-
    //   recomputed rows. Per-level scan is O(dirty subtree), never the
    //   world; eager localCheckpoint keeps the cascade's lineage flat
    //   (a 14-deep dependent plan OOMs AQE plan stringification).
    //
    //   backfill (a batch touching most of the store) — the single fused
    //   ancestor-explode over the full spliced z14: when nearly every
    //   bucket is dirty anyway, O(world) IS the work, and one wide
    //   exchange beats 14 bounded jobs that each scan most of the store.
    //
    // Both recompute EXACTLY the dirty tiles of every level (sum is
    // associative), so the choice is invisible in the output — both paths
    // are exercised by IncrementalSpec (spread batches take the fused
    // path, the confined batch takes the bounded cascade).
    val lowerRecomputed: DataFrame =
      if (dirtyFraction <= FusedCutover) {
        val parts = Seq.newBuilder[DataFrame]
        var recomputed = dirtyZ14 // dirty rows of the level being rolled up
        var z = 13
        while (z >= 0) {
          val children: Set[(Long, Long)] = dirtyByZ(z).flatMap { case (tx, ty) =>
            Seq((2 * tx, 2 * ty), (2 * tx + 1, 2 * ty), (2 * tx, 2 * ty + 1), (2 * tx + 1, 2 * ty + 1))
          }
          val oldChildRows = oldLevel(z + 1, bucketsOf(children))
            .transform(withTiles)
            .join(broadcast(tilesDf(children)), Seq("tx", "ty"), "left_semi")
            .join(broadcast(tilesDf(dirtyByZ(z + 1))), Seq("tx", "ty"), "left_anti")
            .drop("tx", "ty")
          val spliced = oldChildRows.unionByName(recomputed) // recomputed ⊆ children
          recomputed = graft.agg.Pyramid.rollupOne(spliced.as[graft.model.Schemas.GlobalPixel])
            .toDF().localCheckpoint(true)
          parts += recomputed
          z -= 1
        }
        parts.result().reduce(_ unionByName _)
      } else {
        // full spliced z14 (one scan), every pixel exploded into the
        // ancestors whose tiles are dirty, one groupBy for all levels
        val splicedZ14Full = oldLevel(14, allBuckets)
          .transform(withTiles)
          .join(broadcast(tilesDf(dirtySet)), Seq("tx", "ty"), "left_anti")
          .drop("tx", "ty")
          .unionByName(dirtyZ14)
        val res = Res
        val dz = dirtyByZ
        import spark.implicits._
        splicedZ14Full
          .select(col("gx"), col("gy"), col("users"), col("trips"))
          .as[(Long, Long, Long, Long)]
          .flatMap { case (gx, gy, users, trips) =>
            Iterator.range(0, 14).filter { z =>
              val d = 14 - z
              dz(z).contains(((gx >> d) / res, (gy >> d) / res))
            }.map { z =>
              val d = 14 - z
              (z, gx >> d, gy >> d, users, trips)
            }
          }
          .toDF("z", "gx", "gy", "users", "trips")
          .groupBy(col("z"), col("gx"), col("gy"))
          .agg(sum("users").as("users"), sum("trips").as("trips"))
          .select(col("z").cast("int").as("z"), col("gx"), col("gy"), col("users"), col("trips"))
      }

    // kept rows per level: everything in the DIRTY PARTITIONS that is NOT a
    // dirty tile survives unchanged but must be rewritten with its
    // partition (clean partitions are NOT written — commit hardlinks them
    // forward, so writing their rows here would duplicate them in v<next>).
    // Bounded mode scans each level pruned to its own dirty buckets (15
    // small scans); fused mode does ONE scan statically pruned to the dirty
    // (z, pb) directories with a single (z, tx, ty) anti-join — per-level
    // broadcast pruning is pointless when most buckets are dirty, and 15
    // separate broadcasts cost more than they save.
    val kept: DataFrame =
      if (dirtyFraction <= FusedCutover)
        (0 to 14).map { lv =>
          oldLevel(lv, bucketsOf(dirtyByZ(lv)))
            .transform(withTiles)
            .join(broadcast(tilesDf(dirtyByZ(lv))), Seq("tx", "ty"), "left_anti")
            .drop("tx", "ty")
        }.reduce(_ unionByName _)
      else {
        val dirtyAll = (0 to 14).flatMap(lv =>
          dirtyByZ(lv).toSeq.map { case (tx, ty) => (lv, tx, ty) }).toDF("z", "tx", "ty")
        // (z, pb) are partition columns; an isin over their encoding prunes
        // to the dirty directories at plan time — the scan AND the write
        // stay O(dirty partitions) even in fused mode, and no clean-
        // partition row is ever double-materialized (write + hardlink).
        val dirtyDirCodes = (0 to 14).flatMap(lv =>
          bucketsOf(dirtyByZ(lv)).map(b => lv * TileStore.Buckets + b))
        store.read("global", Some(globalSchemaP)) match {
          case None => emptyGlobal
          case Some(g) =>
            g.where((col("z") * TileStore.Buckets + col("pb")).isin(dirtyDirCodes: _*))
              .select("z", "gx", "gy", "users", "trips")
              .transform(withTiles)
              .join(broadcast(dirtyAll), Seq("z", "tx", "ty"), "left_anti")
              .drop("tx", "ty")
        }
      }
    val newGlobalDirty = pbOf(
      Seq(kept, dirtyZ14, lowerRecomputed).reduce(_ unionByName _))
    val globalDirtyDirs: Set[String] = (0 to 14).flatMap(lv =>
      bucketsOf(dirtyByZ(lv)).map(b => s"z=$lv/pb=$b")).toSet

    // per-user cursors (S12, Worker.cs:290-296): last contribution id seen
    // per user, merged with the previous snapshot
    val batchCursors = batch.toDF()
      .groupBy("user_id").agg(max("contribution_id").as("last_id"))
    val userCursors = store.read("user_cursors", Some(userCursorsSchema)) match {
      case None => batchCursors
      case Some(old) =>
        old.withColumnRenamed("last_id", "old_id")
          .join(batchCursors.withColumnRenamed("last_id", "new_id"), Seq("user_id"), "full_outer")
          .select(col("user_id"),
            greatest(coalesce(col("old_id"), lit(-1L)), coalesce(col("new_id"), lit(-1L))).as("last_id"))
    }

    // 6. atomic commit with lineage metrics: dirty partitions written,
    // clean partitions hardlinked forward, dirty tiles recorded for the
    // incremental MVT exporter
    // cluster each partial write by its partition key (one shuffle of the
    // DIRTY rows only): each hive partition gets ONE file instead of one
    // per upstream task — at planetary scale the manifest stays proportional
    // to dirty partitions, not tasks × partitions
    val version = store.commit(fromId, toId,
      relations = Map("user_cursors" -> (userCursors, None)),
      partial = Map(
        "user_pixels" -> TileStore.Partial(pbOf(merged).repartition(col("pb")), Seq("pb"),
          dirtyB.map(b => s"pb=$b").toSet),
        "global" -> TileStore.Partial(newGlobalDirty.repartition(col("z"), col("pb")),
          Seq("z", "pb"), globalDirtyDirs)),
      dirtyTiles = Some(dirtySet.toSeq.sorted))
    delta.unpersist()
    BatchResult(version, skipped = false)
  }

  import org.apache.spark.sql.types._

  val globalSchema: StructType = StructType(Seq(
    StructField("z", IntegerType, nullable = true),
    StructField("gx", LongType, nullable = true),
    StructField("gy", LongType, nullable = true),
    StructField("users", LongType, nullable = true),
    StructField("trips", LongType, nullable = true)))

  /** `globalSchema` + the tile-bucket partition column. */
  val globalSchemaP: StructType = globalSchema.add("pb", IntegerType)

  val userCursorsSchema: StructType = StructType(Seq(
    StructField("user_id", LongType, nullable = true),
    StructField("last_id", LongType, nullable = true)))

  val userPixelsSchema: StructType = StructType(Seq(
    StructField("user_id", LongType, nullable = true),
    StructField("gx", LongType, nullable = true),
    StructField("gy", LongType, nullable = true),
    StructField("trips", LongType, nullable = true)))

  val userPixelsSchemaP: StructType = userPixelsSchema.add("pb", IntegerType)

  private def emptyGlobal(implicit spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], globalSchema)

  /** Drive all batches of `maxContributions` each from the store's cursor to
    * `latestId` (the reference's poll loop, run-once mode). */
  def runToLatest(store: TileStore, tracks: Dataset[Track], latestId: Long,
                  maxContributions: Long = 10,
                  k: Int = HeatmapAgg.KAnonymity)(
      implicit spark: SparkSession): Seq[BatchResult] = {
    var from = store.lastCommittedId
    if (from < 0) from = -1
    val out = Seq.newBuilder[BatchResult]
    while (from < latestId) {
      val to = math.min(from + maxContributions, latestId)
      out += processBatch(store, tracks, from, to, k)
      from = to
    }
    out.result()
  }
}
