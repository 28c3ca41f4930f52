package graft.tools

import org.apache.spark.sql.SparkSession

/**
 * Scaling-efficiency probe for the flagship tile-render critical path:
 * median-of-N JIT-warm timing at each requested parallelism level, in one
 * JVM (the BASELINE.md N vs 4N protocol).
 *
 *   sbt "runMain graft.tools.ScalingProbe <sfDir> <reps> <cpus...>"
 */
object ScalingProbe {
  def flagshipOnce(spark: SparkSession, sfDir: String): (Long, Double) = {
    implicit val s: SparkSession = spark
    val t0 = System.nanoTime()
    // sfDir "direct:N" → N synthesized tracks (amortizes fixed driver/AQE
    // overhead for the scaling measurement); otherwise events-derived
    val tracks =
      if (sfDir.startsWith("direct:"))
        graft.pipeline.HeatmapPipeline.tracksDirect(sfDir.stripPrefix("direct:").toLong)
      else graft.queries.GraftQueries.eventTracks(spark, sfDir)
    val result = graft.pipeline.HeatmapPipeline.run(tracks)
    val tiles = graft.pipeline.HeatmapPipeline.mvt(result.pyramid).count()
    val secs = (System.nanoTime() - t0) / 1e9
    result.z14.unpersist()
    (tiles, secs)
  }

  def measure(cpus: Int, sfDir: String, reps: Int): (Long, Double) = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"scaling-$cpus")
      // strong-scaling protocol: the PLAN stays identical across cluster
      // sizes (fixed partition count, as on a real cluster); only the
      // compute resources change
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.local.dir",
        graft.spark.Sessions.scratchDir.getOrElse(System.getProperty("java.io.tmpdir")))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    flagshipOnce(spark, sfDir) // warmup
    val runs = (1 to reps).map(_ => flagshipOnce(spark, sfDir))
    spark.stop()
    (runs.head._1, runs.map(_._2).sorted.apply(reps / 2))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val levels = if (args.length > 2) args.drop(2).map(_.toInt).toSeq else Seq(2, 8, 32)
    val results = levels.map { c =>
      val (tiles, secs) = measure(c, sfDir, reps)
      println(f"[scaling] cpus=$c%3d median_sec=$secs%7.2f tiles=$tiles tiles_per_sec=${tiles / secs}%8.2f")
      (c, tiles / secs)
    }
    results.sliding(2).foreach {
      case Seq((c1, t1), (c2, t2)) =>
        println(f"[scaling] $c1%d->$c2%d cores: speedup=${t2 / t1}%.2fx efficiency=${(t2 / t1) / (c2.toDouble / c1)}%.3f")
      case _ =>
    }
  }
}
