package graft.tools
import org.apache.spark.sql.SparkSession
/** Stage-level wall-clock profile of the FUSED flagship pipeline:
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
      val tracks = graft.queries.GraftQueries.eventTracks(spark, sfDir)
      val raster = graft.raster.Rasterize.pixelKeys(tracks)
      time("raster only (narrow)")(raster.count())
      val z14 = graft.agg.HeatmapAgg.globalGrainFused(raster)
      z14.persist()
      val nZ14 = time("raster+fused z14")(z14.count())
      val pyr = graft.agg.Pyramid.allLevels(z14)
      pyr.persist()
      val nPyr = time("pyramid explode-agg")(pyr.count())
      val nMvt = time("mvt encode")(graft.pipeline.HeatmapPipeline.mvt(pyr).count())
      println(s"[profile] rows: z14=$nZ14 pyramid=$nPyr mvt=$nMvt")
      z14.unpersist(); pyr.unpersist()
    }
    spark.stop()
  }
}
