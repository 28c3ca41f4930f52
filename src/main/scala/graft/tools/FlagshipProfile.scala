package graft.tools
import org.apache.spark.sql.SparkSession
/** Stage-level wall-clock profile of the TILED flagship pipeline:
  * sbt "runMain graft.tools.FlagshipProfile <cpus> [sfDir] [reps]" */
object FlagshipProfile {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    implicit val spark: SparkSession = graft.spark.Sessions.local(cpus, s"profile-$cpus")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-22s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }
    (1 to reps).foreach { rep =>
      println(s"[profile] --- rep $rep cpus=$cpus ---")
      val tracks =
        if (sfDir.startsWith("direct:"))
          graft.pipeline.HeatmapPipeline.tracksDirect(sfDir.stripPrefix("direct:").toLong)
        else graft.queries.GraftQueries.eventTracks(spark, sfDir)
      val par = spark.sparkContext.defaultParallelism * 2
      val spread = if (tracks.rdd.getNumPartitions < par) tracks.repartition(par) else tracks
      val tv = graft.raster.Rasterize.tileVisits(spread)
      time("raster tileVisits")(tv.count())
      val tc = graft.agg.HeatmapAgg.tileCells(tv)
      tc.persist()
      val nTiles = time("tile-grain agg")(tc.count())
      val z14 = graft.agg.HeatmapAgg.cellsToPixels(tc)
      val nZ14 = time("z14 explode (narrow)")(z14.count())
      val lower = graft.agg.Pyramid.lowerLevelsFromTiles(tc, graft.agg.HeatmapAgg.KAnonymity)
      lower.persist()
      val nLower = time("pyramid local+merge")(lower.count())
      val nMvt = time("mvt encode")(
        graft.pipeline.HeatmapPipeline.mvt(z14.union(lower)).count())
      println(s"[profile] rows: tiles=$nTiles z14=$nZ14 lower=$nLower mvt=$nMvt")
      tc.unpersist(); lower.unpersist()
    }
    spark.stop()
  }
}
