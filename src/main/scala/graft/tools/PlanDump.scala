package graft.tools

/**
 * Dump `.explain("formatted")` for named catalog queries to files — the
 * optimization-round evidence artifact (plans/rNN/<query>_{before,after}.txt).
 *
 *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
 *     sbt -batch 'runMain graft.tools.PlanDump plans/r07 before q_d8_lsh_probe q_d7_dedup_clusters'
 *
 * Writes <outDir>/<query>_<tag>.txt. Building a query may run driver-side
 * jobs (shared dumps / index builds) exactly like the bench's pass 1; the
 * plan captured is the DataFrame the bench would then count().
 */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <tag> <query name>...")
    val outDir = args(0); val tag = args(1); val names = args.drop(2).toSeq
    val missing = names.filterNot(graft.SparkEntry.queries.contains)
    require(missing.isEmpty, s"unknown queries: ${missing.mkString(", ")}")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    implicit val spark: org.apache.spark.sql.SparkSession =
      graft.spark.Sessions.local(cpus, "plan-dump")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    try {
      names.foreach { name =>
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir, s"${name}_$tag.txt"),
          plan.getBytes("UTF-8"))
        graft.dedup.Dedup.releaseCheckpoint(df)
        spark.sharedState.cacheManager.clearCache()
        println(s"[plandump] wrote $outDir/${name}_$tag.txt")
      }
    } finally spark.stop()
  }
}
