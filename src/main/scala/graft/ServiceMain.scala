package graft

import org.apache.spark.sql.SparkSession

import graft.io.TileStore
import graft.model.Schemas.{GlobalPixel, Track}
import graft.pipeline.{Incremental, WorkerConfig}
import graft.stream.StreamingHeatmap

/**
 * The deployable service entry — the engine's replacement for the
 * reference's `Program.cs`/`Worker.cs` host
 * (`/root/reference/src/HeatMap.Tiles.Service/Program.cs:20-43`). Run via
 * spark-submit; ALL configuration arrives as `--conf spark.graft.*`
 * (WorkerConfig), the session master/resources come from the submit
 * environment — nothing is hard-coded for local mode:
 *
 *   spark-submit --class graft.ServiceMain \
 *     --conf spark.graft.dataPath=s3://bucket/tracks \
 *     --conf spark.graft.outputPath=s3://bucket/tiles \
 *     --conf spark.graft.userThreshold=3 \
 *     --conf spark.graft.mode=service  app.jar
 *
 * Modes:
 *   service — Structured-Streaming run-once over dataPath (the reference's
 *             RefreshTime==0 poll loop): each micro-batch flows through the
 *             checkpointed dirty-tile MERGE maintenance, exactly-once.
 *   batch   — id-window batches through the same store (Worker run-once).
 * Both end with the MVT export of the committed state ({z}/{x}/{y}.mvt,
 * Worker.cs:257-279).
 */
object ServiceMain {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().appName("graft-heatmap-service").getOrCreate()
    run(spark)
    spark.stop()
  }

  def run(spark: SparkSession): Unit = {
    implicit val s: SparkSession = spark
    import s.implicits._
    val cfg = WorkerConfig.fromSpark(spark)
    val store = new TileStore(s"${cfg.outputPath}/store")

    spark.conf.get("spark.graft.mode", "service") match {
      case "service" =>
        StreamingHeatmap.runOnce(cfg.dataPath, store, s"${cfg.outputPath}/checkpoint")
      case "batch" =>
        val tracks = spark.read.schema(StreamingHeatmap.trackSchema)
          .parquet(cfg.dataPath).as[Track]
        val maxRow = tracks.agg(org.apache.spark.sql.functions.max("contribution_id"))
          .collect().head
        if (maxRow.isNullAt(0)) {
          // empty input (e.g. first deploy before any tracks land): clean no-op
          System.err.println(s"[graft] no tracks under ${cfg.dataPath}; nothing to do")
        } else {
          Incremental.runToLatest(store, tracks, maxRow.getLong(0), cfg.maxContributions)
        }
      case other => throw new IllegalArgumentException(s"spark.graft.mode=$other")
    }

    // export the committed state as the reference's tile tree
    store.read("global", Some(Incremental.globalSchema)).foreach { g =>
      val tiles = graft.mvt.MvtJobs.encodeTiles(g.as[GlobalPixel])
      graft.mvt.MvtJobs.writeMvtFiles(tiles, s"${cfg.outputPath}/mvt")
    }
  }
}
