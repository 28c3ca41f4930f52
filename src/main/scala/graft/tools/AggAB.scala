package graft.tools
import org.apache.spark.sql.SparkSession
object AggAB {
  def main(args: Array[String]): Unit = {
    val cpus = if (args.length > 0) args(0).toInt else 32
    implicit val spark: SparkSession = graft.spark.Sessions.local(cpus, "agg-ab")
    val sfDir = "/root/testdata/sf0.1"
    def once(which: String): Double = {
      val tracks = graft.queries.GraftQueries.eventTracks(spark, sfDir)
      val raster = graft.raster.Rasterize.pixelKeys(tracks)
      val t0 = System.nanoTime()
      val n = which match {
        case "fused" => graft.agg.HeatmapAgg.globalGrainFused(raster).count()
        case "native" => graft.agg.HeatmapAgg.globalGrainNative(raster).count()
      }
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[ab] $which%-7s cpus=$cpus n=$n sec=$dt%.2f")
      dt
    }
    Seq("fused", "native", "fused", "native", "fused", "native").foreach(once)
    spark.stop()
  }
}
