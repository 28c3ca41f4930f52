package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Same-window interleaved A/B of the round-7 CC edge-layout change
  * (VERDICT's A-B-A-B discipline): run the FULL label-propagation loop on
  * the q_ann_lsh_clusters graph under
  *   A — the r6 setup (two distincts, checkpoint with Unknown layout), and
  *   B — the r7 setup (one repartition(v) + in-place dedup, checkpoint with
  *       declared HashPartitioning(v)),
  * alternating A and B inside ONE session so host drift hits both equally.
  * Prints per-rep loop seconds and the converged-round count (must match).
  * Default regime = the bench session's (AQE on, broadcast on); pass
  * `nobroadcast` to force the at-scale sort-merge regime.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt -batch 'runMain graft.tools.CcLayoutAB [reps] [nobroadcast]'
  */
object CcLayoutAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = args.headOption.flatMap(_.toIntOption).getOrElse(3)
    implicit val spark: SparkSession = graft.spark.Sessions.local(cpus, "cc-layout-ab")
    if (args.contains("nobroadcast"))
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val internals = org.apache.spark.sql.graft.SparkInternals

    // warm the shared dump once (bench pass 1 pays this)
    graft.SparkEntry.queries("q_ann_lsh_clusters")(spark, sfDir).count()
    spark.sharedState.cacheManager.clearCache()

    def inputs(): (DataFrame, DataFrame) = (
      spark.read.parquet("/tmp/graft_oracle/ann_engine_pairs.parquet").select("a", "b"),
      graft.queries.Tables.embeddings(spark, sfDir).select("vec_id"))

    def edgeUnion(pairs: DataFrame, nodes: DataFrame): DataFrame =
      pairs.select(col("a").as("u"), col("b").as("v"))
        .union(pairs.select(col("b").as("u"), col("a").as("v")))
        .select(col("u"), col("v"), lit(false).as("self"))
        .unionByName(nodes.select(col("vec_id").as("u"), col("vec_id").as("v"),
          lit(true).as("self")))

    def setupA(): (DataFrame, DataFrame) = { // r6 shape
      val (pairs, nodes) = inputs()
      val edges = internals.freshLocalCheckpoint(
        pairs.select(col("a").as("u"), col("b").as("v"))
          .union(pairs.select(col("b").as("u"), col("a").as("v")))
          .distinct()
          .select(col("u"), col("v"), lit(false).as("self"))
          .unionByName(nodes.select(col("vec_id")).distinct()
            .select(col("vec_id").as("u"), col("vec_id").as("v"), lit(true).as("self"))))
      val labels = internals.freshLocalCheckpoint(
        edges.where(col("self")).select(col("u").as("n"), col("u").as("lbl")))
      (edges, labels)
    }

    def setupB(): (DataFrame, DataFrame) = { // r7 shape
      val (pairs, nodes) = inputs()
      val n = spark.sessionState.conf.numShufflePartitions
      val edges = internals.freshLocalCheckpointClusteredBy(
        edgeUnion(pairs, nodes).repartition(n, col("v"))
          .dropDuplicates("u", "v", "self"), "v")
      val labels = internals.freshLocalCheckpointClusteredBy(
        edges.where(col("self")).select(col("v").as("n"), col("v").as("lbl")), "n")
      (edges, labels)
    }

    def loop(name: String, setup: () => (DataFrame, DataFrame)): (Double, Int, Long) = {
      val t0 = System.nanoTime()
      var (edgesAll, labels) = setup()
      var round = 0
      var converged = false
      while (!converged && round < 25) {
        val stepped = edgesAll.join(labels, col("v") === labels("n"))
          .groupBy(col("u"))
          .agg(min(col("lbl")).as("new_lbl"),
            min(when(col("self"), col("lbl"))).as("old_lbl"))
          .select(col("u").as("n"), col("old_lbl"), col("new_lbl").as("lbl"))
          .persist()
        val obs = org.apache.spark.sql.Observation()
        val jumped = internals.freshLocalCheckpoint(stepped.as("s")
          .join(stepped.select(col("n").as("ln"), col("lbl").as("llbl")).as("t"),
            col("s.lbl") === col("t.ln"), "left")
          .select(col("s.n").as("n"), col("s.old_lbl").as("old_lbl"),
            least(col("s.lbl"), coalesce(col("t.llbl"), col("s.lbl"))).as("lbl"))
          .observe(obs, coalesce(
            sum(when(col("lbl") =!= col("old_lbl"), 1L).otherwise(0L)), lit(0L)).as("changed")))
        stepped.unpersist()
        val changed = obs.get("changed").asInstanceOf[Long]
        graft.dedup.Dedup.releaseCheckpoint(labels)
        labels = jumped.select(col("n"), col("lbl"))
        converged = changed == 0
        round += 1
      }
      // order-independent fingerprint so A and B provably compute the same labeling
      val fp = labels.select(sum(hash(col("n"), col("lbl")).cast("long"))).head().getLong(0)
      graft.dedup.Dedup.releaseCheckpoint(labels)
      graft.dedup.Dedup.releaseCheckpoint(edgesAll)
      spark.sharedState.cacheManager.clearCache()
      ((System.nanoTime() - t0) / 1e9, round, fp)
    }

    // P — the PRODUCTION path (scale-adaptive layout decision inside
    // Dedup.connectedComponents): must track A in the broadcast regime
    // and B's round structure when broadcast is disabled
    def prod(): (Double, Long) = {
      val t0 = System.nanoTime()
      val (pairs, nodes) = inputs()
      val out = graft.dedup.Dedup.connectedComponents(pairs, nodes)
      val fp = out.select(sum(hash(col("id"), col("cluster_id")).cast("long"))).head().getLong(0)
      graft.dedup.Dedup.releaseCheckpoint(out)
      spark.sharedState.cacheManager.clearCache()
      ((System.nanoTime() - t0) / 1e9, fp)
    }

    // warm all shapes once (JIT), then interleave timed reps
    loop("warmA", setupA _); loop("warmB", setupB _); prod()
    val as = Seq.newBuilder[Double]; val bs = Seq.newBuilder[Double]
    val ps = Seq.newBuilder[Double]
    (1 to reps).foreach { rep =>
      val (ta, ra, fa) = loop("A", setupA _)
      val (tb, rb, fb) = loop("B", setupB _)
      val (tp, fpP) = prod()
      require(fa == fb && ra == rb, s"A/B diverged: rounds $ra/$rb fp $fa/$fb")
      require(fpP == fa, s"production diverged: fp $fpP vs $fa")
      as += ta; bs += tb; ps += tp
      println(f"[ccab] rep$rep A(r6)=$ta%.2f s  B(r7 clustered)=$tb%.2f s  P(prod adaptive)=$tp%.2f s  rounds=$ra fp=$fa")
    }
    val (aMin, bMin, pMin) = (as.result().min, bs.result().min, ps.result().min)
    println(f"[ccab] min A=$aMin%.2f s  min B=$bMin%.2f s  min P=$pMin%.2f s  B/A=${bMin / aMin}%.3f  P/A=${pMin / aMin}%.3f")
    spark.stop()
  }
}
