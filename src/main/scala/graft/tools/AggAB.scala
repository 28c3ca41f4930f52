package graft.tools
import org.apache.spark.sql.SparkSession

/** A/B the four exact z14 k-anonymity plans (fused countDistinct, native
  * pixel-grain user-set aggregate, SALTED two-phase, tile-grain) on the
  * same raster input. The salted variant exists for hot-key regimes (north
  * rule: explicit salting for hot urban cells); this records when it wins.
  *   sbt "runMain graft.tools.AggAB [cpus] [sfDir|direct:N] [hotUsers]"
  * hotUsers > 0 replaces the synthetic user ids with `hotUsers` distinct
  * values (pathological repeat regime: many tracks per (pixel, user)). */
object AggAB {
  def main(args: Array[String]): Unit = {
    val cpus = if (args.length > 0) args(0).toInt else 32
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val hotUsers = if (args.length > 2) args(2).toInt else 0
    implicit val spark: SparkSession = graft.spark.Sessions.local(cpus, "agg-ab")
    import spark.implicits._
    def tracks() = {
      val base =
        if (sfDir.startsWith("direct:"))
          graft.pipeline.HeatmapPipeline.tracksDirect(sfDir.stripPrefix("direct:").toLong)
        else graft.queries.GraftQueries.eventTracks(spark, sfDir)
      if (hotUsers > 0) base.map(t => t.copy(user_id = t.user_id % hotUsers)) else base
    }
    def once(which: String): Double = {
      val raster = graft.raster.Rasterize.pixelKeys(tracks())
      val t0 = System.nanoTime()
      val n = which match {
        case "fused" => graft.agg.HeatmapAgg.globalGrainFused(raster).count()
        case "native" => graft.agg.HeatmapAgg.globalGrainNative(raster).count()
        case "salted" => graft.agg.HeatmapAgg.globalGrainSalted(raster).count()
        case "tiled" =>
          graft.agg.HeatmapAgg.globalGrainTiled(
            graft.raster.Rasterize.tileVisits(tracks())).count()
      }
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[ab] $which%-7s cpus=$cpus hotUsers=$hotUsers n=$n sec=$dt%.2f")
      dt
    }
    val plans = Seq("fused", "native", "salted", "tiled")
    plans.foreach(once) // warmup round
    val timed = plans.map(p => p -> (1 to 2).map(_ => once(p)).min)
    timed.foreach { case (p, t) => println(f"[ab-best] $p%-7s $t%.2fs") }
    spark.stop()
  }
}
