package graft.tools

import org.apache.spark.sql.SparkSession

/**
 * Guide §1.4 companion to the frozen `graft.Bench`: times named catalog
 * queries under the NOOP SINK (`df.write.format("noop")` — computes every
 * column of every row, no optimizer pruning of the action) next to the
 * bench's own `count()` estimator, so a plan claim can be checked against
 * a sink the optimizer cannot cheat. Separate main by design — the bench
 * protocol and its artifact are measurement-frozen.
 *
 *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
 *     sbt -batch 'runMain graft.tools.BenchExtra q_t5_decontam q_img_phash_neardups [passes]'
 *
 * Prints one line per query: min noop-sink seconds and min count() seconds
 * over `passes` interleaved passes (cache cleared between runs, same
 * hygiene as the bench). Checkpoint-returning queries (the dedup/CC
 * family) do their work eagerly at build time; for those the two columns
 * converge by construction.
 */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val (names, passes) = args.lastOption.flatMap(_.toIntOption) match {
      case Some(p) => (args.dropRight(1).toSeq, p)
      case None => (args.toSeq, 3)
    }
    require(names.nonEmpty, "usage: BenchExtra <query name>... [passes]")
    val missing = names.filterNot(graft.SparkEntry.queries.contains)
    require(missing.isEmpty, s"unknown queries: ${missing.mkString(", ")}")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    implicit val spark: SparkSession = graft.spark.Sessions.local(cpus, "bench-extra")

    def once(name: String, sink: String): Double = {
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      sink match {
        case "noop" => df.write.format("noop").mode("overwrite").save()
        case _ => df.count()
      }
      val dt = (System.nanoTime() - t0) / 1e9
      graft.dedup.Dedup.releaseCheckpoint(df)
      spark.sharedState.cacheManager.clearCache()
      dt
    }
    // one discarded warm pass (dump builds, JIT), then interleaved passes
    names.foreach(n => once(n, "count"))
    val results = names.map { n =>
      val noop = (1 to passes).map(_ => once(n, "noop"))
      val cnt = (1 to passes).map(_ => once(n, "count"))
      (n, noop.min, cnt.min, noop, cnt)
    }
    results.foreach { case (n, nmin, cmin, ns, cs) =>
      println(f"[benchextra] $n%-28s noop_min=$nmin%6.3f count_min=$cmin%6.3f " +
        f"noop=[${ns.map(v => f"$v%.2f").mkString(",")}] count=[${cs.map(v => f"$v%.2f").mkString(",")}]")
    }
    spark.stop()
  }
}
