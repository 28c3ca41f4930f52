package graft.tools
import org.apache.spark.sql.SparkSession

/** Ad-hoc timing for any subset of the SparkEntry catalog: 3 rounds per
  * query (round 1 pays one-time shared-dump/index costs, later rounds are
  * the steady state min-of-2 sees in Bench). Usage:
  *   runMain graft.tools.QueryProbe q_d6_jaccard_join q_d7_dedup_clusters
  * No args = the whole catalog, one line per query per round. */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    implicit val spark: SparkSession = graft.spark.Sessions.local(32, "qprobe")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    (1 to 3).foreach { round =>
      names.foreach { name =>
        val fn = graft.SparkEntry.queries.getOrElse(name,
          sys.error(s"unknown query $name"))
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        println(f"[qprobe] round=$round $name rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
        spark.sharedState.cacheManager.clearCache()
      }
    }
    spark.stop()
  }
}
