package graft.tools

import org.apache.spark.sql.SparkSession

/**
 * Scaling-efficiency probe for the flagship tile-render critical path:
 * median-of-N JIT-warm timing at each requested parallelism level.
 *
 *   sbt "runMain graft.tools.ScalingProbe <sfDir> <reps> <level...>"
 *
 * Level specs:
 *   `8`     → local[8]            (threads sharing ONE JVM heap)
 *   `1x8`   → local-cluster[1,8,6144] (real executor JVMs — the cluster
 *              topology the north rule names: N vs 4N EXECUTORS, each with
 *              its own heap, GC and shuffle client, like spark-submit)
 *
 * The executor-JVM form is the faithful substitute for a multi-node
 * cluster: local[8] vs local[32] shares one heap across all threads, which
 * measures the JVM memory path, not the engine's scaling.
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
    val tiles = graft.pipeline.HeatmapPipeline.mvtAll(result).count()
    val secs = (System.nanoTime() - t0) / 1e9
    result.release()
    (tiles, secs)
  }

  /** (master url, total cores) for a level spec. */
  def masterOf(spec: String): (String, Int) = spec.split("x") match {
    case Array(n, c) => (s"local-cluster[$n,$c,6144]", n.toInt * c.toInt)
    case Array(n) => (s"local[$n]", n.toInt)
    case _ => throw new IllegalArgumentException(spec)
  }

  def measure(spec: String, sfDir: String, reps: Int): (Long, Double) = {
    val (master, _) = masterOf(spec)
    val builder = SparkSession.builder()
      .master(master)
      .appName(s"scaling-$spec")
      // strong-scaling protocol: the PLAN stays identical across cluster
      // sizes (fixed partition count, as on a real cluster); only the
      // compute resources change
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4096")
      .config("spark.local.dir",
        graft.spark.Sessions.scratchDir.getOrElse(System.getProperty("java.io.tmpdir")))
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.ui.enabled", "false")
      // don't stall stages waiting for process-local slots on cached
      // partitions — on a loopback cluster every executor is equally close
      .config("spark.locality.wait", "0s")
    // executor JVMs need the app classes + JDK17 module opens
    val spark = (if (spec.contains("x")) builder
      .config("spark.executor.memory", "6g") // worker offers 6144m; default executor heap is only 1g
      .config("spark.executor.extraClassPath",
        new java.io.File("target/scala-2.13/classes").getAbsolutePath)
      .config("spark.executor.extraJavaOptions",
        org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions())
    else builder).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    flagshipOnce(spark, sfDir) // warmup
    val runs = (1 to reps).map(_ => flagshipOnce(spark, sfDir))
    spark.stop()
    (runs.head._1, runs.map(_._2).sorted.apply(reps / 2))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val levels = if (args.length > 2) args.drop(2).toSeq else Seq("2", "8", "32")
    val results = levels.map { spec =>
      val cores = masterOf(spec)._2
      val (tiles, secs) = measure(spec, sfDir, reps)
      println(f"[scaling] level=$spec%-6s cores=$cores%3d median_sec=$secs%7.2f tiles=$tiles tiles_per_sec=${tiles / secs}%8.2f")
      (cores, tiles / secs)
    }
    results.sliding(2).foreach {
      case Seq((c1, t1), (c2, t2)) =>
        println(f"[scaling] $c1%d->$c2%d cores: speedup=${t2 / t1}%.2fx efficiency=${(t2 / t1) / (c2.toDouble / c1)}%.3f")
      case _ =>
    }
  }
}
