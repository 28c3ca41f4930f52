package graft.tools

import org.apache.spark.sql.SparkSession

import graft.pipeline.HeatmapPipeline

/**
 * Sample driver: the library's flagship flow end-to-end, the way a user
 * would call it. Synthesizes the Iceberg-shaped image+caption table,
 * derives tracks, renders the zoom 0-14 heatmap and writes MVT tiles.
 *
 *   sbt "runMain graft.tools.HeatmapDemo <nImages> <outDir> [cpus] [k]"
 */
object HeatmapDemo {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 1000L
    val outDir = if (args.length > 1) args(1) else "/tmp/graft-demo"
    val cpus = if (args.length > 2) args(2).toInt else 8
    val k = if (args.length > 3) args(3).toInt else graft.agg.HeatmapAgg.KAnonymity

    implicit val spark: SparkSession = graft.spark.Sessions.local(cpus, "heatmap-demo")
    val t0 = System.nanoTime()

    val images = HeatmapPipeline.images(n)
    val tracks = HeatmapPipeline.tracks(images)
    val result = HeatmapPipeline.run(tracks, k)
    val tiles = HeatmapPipeline.mvtAll(result)

    tiles.persist()
    tiles.write.mode("overwrite").partitionBy("z").parquet(s"$outDir/tiles")
    // the reference's on-disk layout, decodable by the independent
    // python decoder: tools/decode_mvt.py --tree <outDir>/mvt
    graft.mvt.MvtJobs.writeMvtFiles(tiles, s"$outDir/mvt")

    // an all-filtered run writes an empty dir (only _SUCCESS) — parquet
    // schema inference would fail on readback, so count the Dataset itself
    val nTiles = tiles.count()
    val nZ14 = result.z14.count()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"images=$n z14_pixels=$nZ14 mvt_tiles=$nTiles k=$k elapsed=$secs%.1fs tiles_per_sec=${nTiles / secs}%.1f")
    println(s"output: $outDir/tiles (parquet, partitioned by z)")
    spark.stop()
  }
}
