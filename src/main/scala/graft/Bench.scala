package graft

import org.apache.spark.sql.SparkSession

/**
 * Benchmark main (driver contract): runs every SparkEntry query on
 * SPARK_GRAFT_SF_DIR, then measures the flagship tile-render critical path
 * (rasterize → k-anon agg → 14-level pyramid → MVT encode) at TWO
 * parallelism levels — local[N/4] and local[N] — the sandbox substitute for
 * the north rule's N vs 4N executor scaling (BASELINE.md protocol).
 * Prints ONE JSON line.
 */
object Bench {

  /** One flagship pass (rasterize → k-anon → pyramid → MVT) in an existing
    * session; returns (tiles, seconds). */
  private def flagshipOnce(spark: SparkSession, sfDir: String): (Long, Double) = {
    implicit val s: SparkSession = spark
    val t0 = System.nanoTime()
    val tracks = graft.queries.GraftQueries.eventTracks(spark, sfDir)
    val result = graft.pipeline.HeatmapPipeline.run(tracks)
    val tiles = graft.pipeline.HeatmapPipeline.mvt(result.pyramid).count()
    val secs = (System.nanoTime() - t0) / 1e9
    result.z14.unpersist()
    (tiles, secs)
  }

  /** Median-of-3 JIT-warm flagship timing at one parallelism level. */
  private def flagshipTilesPerSec(cpus: Int, sfDir: String, warmups: Int = 1,
                                  reps: Int = 3): (Double, Long, Double) = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      // strong-scaling protocol: identical plan (fixed partition count) at
      // both cluster sizes; only compute changes (BENCH/BASELINE.md)
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.local.dir",
        graft.spark.Sessions.scratchDir.getOrElse(System.getProperty("java.io.tmpdir")))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to warmups).foreach(_ => flagshipOnce(spark, sfDir))
    val runs = (1 to reps).map(_ => flagshipOnce(spark, sfDir))
    spark.stop()
    val tiles = runs.head._1
    val secs = runs.map(_._2).sorted.apply(reps / 2)
    (tiles / secs, tiles, secs)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt

    // per-query timings at full parallelism
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.local.dir",
        graft.spark.Sessions.scratchDir.getOrElse(System.getProperty("java.io.tmpdir")))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      // cache-ownership contract: a query may persist intermediates for its
      // own lifetime (e.g. HeatmapPipeline.run's z14); the harness owns the
      // session and clears the cache between queries so nothing leaks into
      // the next measurement.
      spark.sharedState.cacheManager.clearCache()
      name -> dt
    }
    spark.stop()

    // flagship tile-render critical path at N/4 and N threads (same input)
    val lowCpus = math.max(cpus / 4, 2)
    val (tpsLow, _, secsLow) = flagshipTilesPerSec(lowCpus, sfDir)
    val (tpsHigh, tiles, secsHigh) = flagshipTilesPerSec(cpus, sfDir)
    val efficiency = (tpsHigh / tpsLow) / (cpus.toDouble / lowCpus)

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir",""" +
      s""""flagship":{"tiles":$tiles,"cpus_low":$lowCpus,"cpus_high":$cpus,""" +
      s""""sec_low":$secsLow,"sec_high":$secsHigh,""" +
      s""""tiles_per_sec_low":$tpsLow,"tiles_per_sec_high":$tpsHigh,""" +
      s""""scaling_efficiency":$efficiency}}"""
    // the driver parses the LAST stdout line that is bare JSON; sbt's logger
    // prefixes [info], so print on BOTH streams (run/outputStrategy is also
    // set to StdoutOutput in build.sbt) and drop a file copy for good measure
    println(json)
    System.out.flush()
    try java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_LAST.json"),
      (json + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => }
  }
}
