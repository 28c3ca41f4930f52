package graft.tools

import org.apache.spark.sql.SparkSession

import graft.io.TileStore
import graft.pipeline.Incremental

/**
 * Incremental-service demo: processes the events-derived track stream in
 * id-window batches through a persistent on-disk TileStore (the reference's
 * worker loop in run-once mode). Re-running against the same store resumes
 * from the committed cursor and skips finished windows.
 *
 *   sbt "runMain graft.tools.IncrementalDemo <storeDir> <sfDir> <batchSize> [cpus]"
 */
object IncrementalDemo {
  def main(args: Array[String]): Unit = {
    val storeDir = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val batchSize = if (args.length > 2) args(2).toLong else 2000L
    val cpus = if (args.length > 3) args(3).toInt else 8
    implicit val spark: SparkSession = graft.spark.Sessions.local(cpus, "incremental-demo")

    val store = new TileStore(storeDir)
    val tracks = graft.queries.GraftQueries.eventTracks(spark, sfDir)
    val latest = tracks.agg(org.apache.spark.sql.functions.max("contribution_id"))
      .collect().head.getLong(0)
    println(s"[demo] store v${store.currentVersion}, cursor=${store.lastCommittedId}, latest=$latest")
    val t0 = System.nanoTime()
    val results = Incremental.runToLatest(store, tracks, latest, batchSize)
    val processed = results.count(!_.skipped)
    val global = store.read("global", Some(Incremental.globalSchema)).map(_.count()).getOrElse(0L)
    println(f"[demo] batches=${results.size} processed=$processed skipped=${results.size - processed} " +
      f"version=${store.currentVersion} cursor=${store.lastCommittedId} global_pixels=$global " +
      f"elapsed=${(System.nanoTime() - t0) / 1e9}%.1fs")
    spark.stop()
  }
}
