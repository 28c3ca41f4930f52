package graft.tools

/**
 * Targeted per-query measurement: run ONLY the named catalog queries
 * through the bench harness's own protocol (`Bench.measureQueries` —
 * interleaved passes, cache-cleared, checkpoint-released) without paying
 * for the other ~70. For isolating a regression suspect or A/B-ing a
 * plan change on one query.
 *
 *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
 *     sbt -batch 'runMain graft.tools.QueryProbe q_img_dedup_clusters q_d7_dedup_clusters [passes]'
 *
 * A trailing integer argument sets the pass count (default 3; min is
 * reported like the bench, all samples printed).
 */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val (names, passes) = args.lastOption.flatMap(_.toIntOption) match {
      case Some(p) => (args.dropRight(1).toSeq, p)
      case None => (args.toSeq, 3)
    }
    require(names.nonEmpty, "usage: QueryProbe <query name>... [passes]")
    val missing = names.filterNot(graft.SparkEntry.queries.contains)
    require(missing.isEmpty, s"unknown queries: ${missing.mkString(", ")}")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    implicit val spark: org.apache.spark.sql.SparkSession =
      graft.spark.Sessions.local(cpus, "query-probe")
    try {
      val picked = graft.SparkEntry.queries.view.filterKeys(names.contains).toMap
      val results = graft.Bench.measureQueries(spark, sfDir, picked, passes = passes)
      results.foreach { m =>
        val samples = m.samples.map(_.fold(e => s"err($e)", v => f"$v%.2f")).mkString(", ")
        println(f"[probe] ${m.name}%-30s min=${m.secs.fold(Double.NaN)(identity)}%6.2f  samples=[$samples]")
      }
    } finally spark.stop()
  }
}
