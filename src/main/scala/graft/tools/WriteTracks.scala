package graft.tools

import org.apache.spark.sql.SparkSession

/** Write n deterministic synthetic tracks as Track-schema parquet — seed
  * data for driving `graft.ServiceMain` (spark-submit smoke tests, demos).
  *
  *   sbt "runMain graft.tools.WriteTracks <outDir> <n> [cpus]"
  */
object WriteTracks {
  def main(args: Array[String]): Unit = {
    val out = args(0)
    val n = if (args.length > 1) args(1).toLong else 1000L
    val cpus = if (args.length > 2) args(2).toInt else 8
    implicit val spark: SparkSession = graft.spark.Sessions.local(cpus, "write-tracks")
    graft.pipeline.HeatmapPipeline.tracksDirect(n).write.mode("overwrite").parquet(out)
    println(s"[write-tracks] wrote $n tracks to $out")
    spark.stop()
  }
}
