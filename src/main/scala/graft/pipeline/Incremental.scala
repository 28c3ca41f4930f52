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
 *      (full-outer + saturating add = Diffs/HeatMapExtensions.cs:49-131)
 *   4. recompute the global z14 layer ONLY for dirty tiles
 *      (Worker.cs:167-222), splice into the snapshot
 *   5. roll the dirty ancestor chain up the pyramid from the spliced
 *      child level (HeatMapExtensions.cs:148-214), splice each level
 *   6. commit all relations + cursor atomically with lineage metrics
 *
 * Every pixel-grain step is keyed/partitioned; the dirty-TILE set is the
 * one deliberately driver-side structure — bounded by the id-window
 * (maxContributions × tiles-per-track), the same contract as the
 * reference's in-memory HashSet (Worker.cs:99-103) — so at 10^12-row scale
 * the per-batch cost is bounded by the touched-tile subtree, not the world.
 */
object Incremental {
  val Res = Rasterize.Resolution

  final case class BatchResult(version: Long, skipped: Boolean)

  private def tileOf(gxCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    floor(gxCol / Res).cast("long")

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

    val delta = HeatmapAgg.userGrain(Rasterize.userPixels(batch)).toDF()
    delta.persist()

    // 3. merge user pixels
    // localCheckpoint truncates logical lineage: the per-level splice loop
    // below would otherwise nest 15 plans deep and blow up plan
    // stringification/AQE (observed OOM)
    val merged = mergeUserPixels(store.read("user_pixels", Some(userPixelsSchema)), delta)
      .localCheckpoint(false)

    // 4. dirty z14 tiles + global layer rebuild restricted to them.
    // The per-batch dirty set is bounded by the id-window (maxContributions ×
    // tiles-per-track), exactly the reference's in-memory HashSet
    // (Worker.cs:99-103) — collect it once; ancestor sets then derive on the
    // driver instead of through a 14-deep chain of distinct+broadcast jobs.
    import spark.implicits._
    val dirtySet: Set[(Long, Long)] = delta
      .select(tileOf(col("gx")).as("tx"), tileOf(col("gy")).as("ty")).distinct()
      .as[(Long, Long)].collect().toSet
    def dirtyDf(s: Set[(Long, Long)]) = s.toSeq.toDF("tx", "ty")
    val dirty = dirtyDf(dirtySet)
    val dirtyZ14 = merged
      .withColumn("tx", tileOf(col("gx"))).withColumn("ty", tileOf(col("gy")))
      .join(broadcast(dirty), Seq("tx", "ty"), "left_semi")
      .groupBy("gx", "gy")
      .agg(countDistinct(col("user_id")).as("users"), sum("trips").as("trips"))
      .where(col("users") >= k)
      .select(lit(14).as("z"), col("gx"), col("gy"), col("users"), col("trips"))

    // splice z14: keep clean tiles, replace dirty ones
    val oldGlobal = store.read("global", Some(globalSchema))
    val oldZ14 = oldGlobal.map(_.where(col("z") === 14)).getOrElse(emptyGlobal)
    val splicedZ14 = oldZ14
      .withColumn("tx", tileOf(col("gx"))).withColumn("ty", tileOf(col("gy")))
      .join(broadcast(dirty), Seq("tx", "ty"), "left_anti")
      .drop("tx", "ty")
      .unionByName(dirtyZ14)
      .localCheckpoint(false)

    // 5. ancestor rollup in ONE exchange (was 14 sequential splice levels,
    // each a localCheckpoint job — ~3× the batch latency): every spliced
    // z14 pixel explodes into its ancestors, pruned INSIDE the flatMap to
    // the dirty subtrees (the per-level dirty-tile sets are the same
    // driver-side structure as before — bounded by the id-window), then a
    // single groupBy recomputes all dirty parents of all levels. Sum is
    // associative, so this equals the level-by-level cascade exactly
    // (IncrementalSpec: incremental == one-shot pipeline).
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
    val res = Res
    val recomputed = splicedZ14
      .select(col("gx"), col("gy"), col("users"), col("trips"))
      .as[(Long, Long, Long, Long)]
      .flatMap { case (gx, gy, users, trips) =>
        Iterator.range(0, 14).filter { z =>
          val d = 14 - z
          dirtyByZ(z).contains(((gx >> d) / res, (gy >> d) / res))
        }.map { z =>
          val d = 14 - z
          (z, gx >> d, gy >> d, users, trips)
        }
      }
      .toDF("z", "gx", "gy", "users", "trips")
      .groupBy(col("z"), col("gx"), col("gy"))
      .agg(sum("users").as("users"), sum("trips").as("trips"))

    // splice every lower level at once: drop old rows in dirty subtrees
    val dirtyAll = dirtyByZ.zipWithIndex.take(14)
      .flatMap { case (s, z) => s.map { case (tx, ty) => (z, tx, ty) } }.toSeq
      .toDF("z", "tx", "ty")
    val oldLower = oldGlobal.map(_.where(col("z") < 14)).getOrElse(emptyGlobal)
    val keptLower = oldLower
      .withColumn("tx", tileOf(col("gx"))).withColumn("ty", tileOf(col("gy")))
      .join(broadcast(dirtyAll), Seq("z", "tx", "ty"), "left_anti")
      .drop("tx", "ty")
    val newGlobal = splicedZ14.unionByName(keptLower).unionByName(recomputed)

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

    // 6. atomic commit with lineage metrics
    val version = store.commit(fromId, toId, Map(
      "user_pixels" -> (merged, None),
      "user_cursors" -> (userCursors, None),
      "global" -> (newGlobal, Some("z"))))
    delta.unpersist(); merged.unpersist()
    BatchResult(version, skipped = false)
  }

  import org.apache.spark.sql.types._

  val globalSchema: StructType = StructType(Seq(
    StructField("z", IntegerType, nullable = true),
    StructField("gx", LongType, nullable = true),
    StructField("gy", LongType, nullable = true),
    StructField("users", LongType, nullable = true),
    StructField("trips", LongType, nullable = true)))

  val userCursorsSchema: StructType = StructType(Seq(
    StructField("user_id", LongType, nullable = true),
    StructField("last_id", LongType, nullable = true)))

  val userPixelsSchema: StructType = StructType(Seq(
    StructField("user_id", LongType, nullable = true),
    StructField("gx", LongType, nullable = true),
    StructField("gy", LongType, nullable = true),
    StructField("trips", LongType, nullable = true)))

  private def emptyGlobal(implicit spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], globalSchema)

  /** Drive all batches of `maxContributions` each from the store's cursor to
    * `latestId` (the reference's poll loop, run-once mode). */
  def runToLatest(store: TileStore, tracks: Dataset[Track], latestId: Long,
                  maxContributions: Long = 10)(
      implicit spark: SparkSession): Seq[BatchResult] = {
    var from = store.lastCommittedId
    if (from < 0) from = -1
    val out = Seq.newBuilder[BatchResult]
    while (from < latestId) {
      val to = math.min(from + maxContributions, latestId)
      out += processBatch(store, tracks, from, to)
      from = to
    }
    out.result()
  }
}
