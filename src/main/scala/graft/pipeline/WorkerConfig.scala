package graft.pipeline

import org.apache.spark.sql.SparkSession

/**
 * Engine configuration (S14): the reference's `WorkerConfiguration`
 * (`/root/reference/src/HeatMap.Tiles.Service/WorkerConfiguration.cs:3-18`,
 * defaults `Program.cs:34-37`, `appsettings.json:22-26`) re-expressed as
 * `spark.graft.*` conf keys — supplied via `spark-submit --conf` on a
 * cluster, `SparkSession.builder.config` locally.
 *
 * `maxUsers` is carried for parity but the batch boundary is the id window
 * (maxContributions): the reference's mid-scan break on the (MaxUsers+1)th
 * user (Worker.cs:152) is inherently sequential and only shapes batching,
 * never results — SURVEY.md §2.4 A1, documented divergence.
 */
final case class WorkerConfig(
    userThreshold: Int,
    maxUsers: Int,
    maxContributions: Long,
    refreshTimeMs: Long,
    dataPath: String,
    outputPath: String,
    keepVersions: Option[Int])

object WorkerConfig {
  def fromSpark(spark: SparkSession): WorkerConfig = {
    val c = spark.conf
    WorkerConfig(
      userThreshold = c.get("spark.graft.userThreshold", "3").toInt,
      maxUsers = c.get("spark.graft.maxUsers", "2").toInt,
      maxContributions = c.get("spark.graft.maxContributions", "10").toLong,
      refreshTimeMs = c.get("spark.graft.refreshTime", "1000").toLong,
      dataPath = c.get("spark.graft.dataPath", "/tmp/graft-data"),
      outputPath = c.get("spark.graft.outputPath", "/tmp/graft-tiles"),
      keepVersions = c.getOption("spark.graft.keepVersions").map { v =>
        val n = try v.toInt catch {
          case _: NumberFormatException =>
            throw new IllegalArgumentException(s"spark.graft.keepVersions must be an int >= 1, got '$v'")
        }
        require(n >= 1, s"spark.graft.keepVersions must be >= 1, got $n")
        n
      })
  }
}
