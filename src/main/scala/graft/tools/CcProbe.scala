package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Phase-level timing for the connected-components family (the round-7
  * optimization target): replays `Dedup.connectedComponents` round by round
  * on the q_ann_lsh_clusters inputs with per-phase wall clocks. Run AFTER a
  * bench pass so the shared dumps are warm (steady state). */
object CcProbe {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[ccprobe] $label sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    implicit val spark: SparkSession = graft.spark.Sessions.local(cpus, "cc-probe")
    val reps = args.headOption.flatMap(_.toIntOption).getOrElse(2)
    // warm the dumps once (not timed here; bench pass 1 pays this)
    graft.SparkEntry.queries("q_ann_lsh_clusters")(spark, sfDir).count()
    spark.sharedState.cacheManager.clearCache()
    val fresh = org.apache.spark.sql.graft.SparkInternals.freshLocalCheckpoint _
    (1 to reps).foreach { rep =>
      // q_ann_lsh_clusters inputs: engine pair dump + full embeddings ids
      val pairs = spark.read.parquet("/tmp/graft_oracle/ann_engine_pairs.parquet").select("a", "b")
      val nodes = graft.queries.Tables.embeddings(spark, sfDir).select("vec_id")
      val edges = t(s"rep$rep edges checkpoint")(fresh(
        pairs.select(col("a").as("u"), col("b").as("v"))
          .union(pairs.select(col("b").as("u"), col("a").as("v")))
          .distinct()))
      var labels = t(s"rep$rep labels checkpoint")(fresh(
        nodes.select(col(nodes.columns(0)).as("n")).distinct().withColumn("lbl", col("n"))))
      t(s"rep$rep precondition probe")(
        require(edges.join(labels, edges("u") === labels("n"), "left_anti").isEmpty))
      var round = 0
      var converged = false
      while (!converged && round < 25) {
        val nbrMin = edges.join(labels, edges("v") === labels("n"))
          .groupBy(col("u")).agg(min(col("lbl")).as("nbr_lbl"))
        val stepped = labels.join(nbrMin, labels("n") === nbrMin("u"), "left")
          .select(col("n"), col("lbl").as("old_lbl"),
            least(col("lbl"), coalesce(col("nbr_lbl"), col("lbl"))).as("lbl"))
          .persist()
        val jumped = t(s"rep$rep round$round jump+checkpoint")(fresh(stepped.as("s")
          .join(stepped.select(col("n").as("ln"), col("lbl").as("llbl")).as("t"),
            col("s.lbl") === col("t.ln"), "left")
          .select(col("s.n").as("n"), col("s.old_lbl").as("old_lbl"),
            least(col("s.lbl"), coalesce(col("t.llbl"), col("s.lbl"))).as("lbl"))))
        stepped.unpersist()
        val changed = t(s"rep$rep round$round changed-count")(
          jumped.where(col("lbl") =!= col("old_lbl")).count())
        graft.dedup.Dedup.releaseCheckpoint(labels)
        labels = jumped.select(col("n"), col("lbl"))
        converged = changed == 0
        round += 1
        println(s"[ccprobe] rep$rep round${round - 1} changed=$changed")
      }
      graft.dedup.Dedup.releaseCheckpoint(labels)
      graft.dedup.Dedup.releaseCheckpoint(edges)
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
