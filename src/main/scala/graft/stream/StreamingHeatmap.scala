package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.io.TileStore
import graft.model.Schemas.Track
import graft.pipeline.Incremental

/**
 * Structured-Streaming front end for the incremental heatmap: the streaming
 * engine drives micro-batches (the reference's poll loop,
 * `/root/reference/src/HeatMap.Tiles.Service/Worker.cs:50-61`, with
 * `Trigger.AvailableNow` as the run-once `RefreshTime == 0` mode) and each
 * micro-batch flows through the same dirty-tile MERGE maintenance as the
 * batch path. Exactly-once: the TileStore commit is keyed by the streaming
 * batch id, so a replayed micro-batch after crash-restart is skipped —
 * ids are monotonic, no event-time/watermark needed (Db.cs:50 ordering).
 */
object StreamingHeatmap {

  /** Track source schema for the streaming parquet dir. */
  val trackSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.Encoders.product[Track].schema

  /**
   * Start the stream: watch `sourceDir` for new track parquet files, apply
   * each micro-batch to `store`. Run-once semantics via AvailableNow.
   */
  def start(sourceDir: String, store: TileStore, checkpointDir: String,
            availableNow: Boolean = true, maxFilesPerTrigger: Int = 1,
            k: Int = graft.agg.HeatmapAgg.KAnonymity)(
      implicit spark: SparkSession): StreamingQuery = {
    import spark.implicits._
    val source = spark.readStream
      .schema(trackSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir)
      .as[Track]
    val writer = source.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Track], batchId: Long) =>
        Incremental.processMicroBatch(store, batch, batchId, k)
        ()
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }

  /** Convenience: run to completion (run-once mode) and return the store. */
  def runOnce(sourceDir: String, store: TileStore, checkpointDir: String,
              k: Int = graft.agg.HeatmapAgg.KAnonymity)(
      implicit spark: SparkSession): Unit = {
    val q = start(sourceDir, store, checkpointDir, k = k)
    q.awaitTermination()
  }
}
