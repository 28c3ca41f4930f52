package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B probe for the r7 double-pointer-jump CC experiment: same loop as
  * `CcProbe` but with TWO path-halving self-joins per round (distance to
  * the root ~quarters per round instead of halving), measuring whether the
  * saved rounds beat the extra in-round join on the q_ann_lsh_clusters
  * graph. Run AFTER a bench pass so the shared dumps are warm. */
object CcJump2Probe {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[ccjump2] $label sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    implicit val spark: SparkSession = graft.spark.Sessions.local(cpus, "cc-jump2-probe")
    val reps = args.headOption.flatMap(_.toIntOption).getOrElse(2)
    graft.SparkEntry.queries("q_ann_lsh_clusters")(spark, sfDir).count()
    spark.sharedState.cacheManager.clearCache()
    val fresh = org.apache.spark.sql.graft.SparkInternals.freshLocalCheckpoint _
    (1 to reps).foreach { rep =>
      val pairs = spark.read.parquet("/tmp/graft_oracle/ann_engine_pairs.parquet").select("a", "b")
      val nodes = graft.queries.Tables.embeddings(spark, sfDir).select("vec_id")
      val edgesAll = t(s"rep$rep edgesAll checkpoint")(fresh(
        pairs.select(col("a").as("u"), col("b").as("v"))
          .union(pairs.select(col("b").as("u"), col("a").as("v")))
          .distinct()
          .select(col("u"), col("v"), lit(false).as("self"))
          .unionByName(nodes.select(col(nodes.columns(0)).as("n")).distinct()
            .select(col("n").as("u"), col("n").as("v"), lit(true).as("self")))))
      var labels = fresh(edgesAll.where(col("self")).select(col("u").as("n"), col("u").as("lbl")))
      var round = 0
      var converged = false
      val totalT0 = System.nanoTime()
      while (!converged && round < 25) {
        val stepped = edgesAll.join(labels, col("v") === labels("n"))
          .groupBy(col("u"))
          .agg(min(col("lbl")).as("new_lbl"),
            min(when(col("self"), col("lbl"))).as("old_lbl"))
          .select(col("u").as("n"), col("old_lbl"), col("new_lbl").as("lbl"))
          .persist()
        // jump 1 (persisted: feeds both sides of jump 2)
        val j1 = stepped.as("s")
          .join(stepped.select(col("n").as("ln"), col("lbl").as("llbl")).as("t"),
            col("s.lbl") === col("t.ln"), "left")
          .select(col("s.n").as("n"), col("s.old_lbl").as("old_lbl"),
            least(col("s.lbl"), coalesce(col("t.llbl"), col("s.lbl"))).as("lbl"))
          .persist()
        // jump 2 + convergence observation inside the checkpoint job
        val obs = org.apache.spark.sql.Observation()
        val jumped = t(s"rep$rep round$round 2jump+checkpoint")(fresh(j1.as("s")
          .join(j1.select(col("n").as("ln"), col("lbl").as("llbl")).as("t"),
            col("s.lbl") === col("t.ln"), "left")
          .select(col("s.n").as("n"), col("s.old_lbl").as("old_lbl"),
            least(col("s.lbl"), coalesce(col("t.llbl"), col("s.lbl"))).as("lbl"))
          .observe(obs, coalesce(
            sum(when(col("lbl") =!= col("old_lbl"), 1L).otherwise(0L)),
            lit(0L)).as("changed"))))
        j1.unpersist(); stepped.unpersist()
        val changed = obs.get("changed").asInstanceOf[Long]
        graft.dedup.Dedup.releaseCheckpoint(labels)
        labels = jumped.select(col("n"), col("lbl"))
        converged = changed == 0
        round += 1
        println(s"[ccjump2] rep$rep round${round - 1} changed=$changed")
      }
      println(f"[ccjump2] rep$rep TOTAL rounds=$round sec=${(System.nanoTime() - totalT0) / 1e9}%.2f")
      graft.dedup.Dedup.releaseCheckpoint(labels)
      graft.dedup.Dedup.releaseCheckpoint(edgesAll)
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
