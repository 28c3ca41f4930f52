package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Plan evidence for the round-7 connected-components layout change: prints
  * `explain("formatted")` of one CC round's neighbor-min join (edges ⋈
  * labels ON v = n, then groupBy u) in the NON-BROADCAST regime
  * (`autoBroadcastJoinThreshold = -1`, the at-scale sort-merge shape) under
  * both edge-relation layouts:
  *
  *   before — the r6 setup: checkpoint declared `UnknownPartitioning` →
  *            the join re-exchanges the edge side EVERY round;
  *   after  — the r7 CLUSTERED branch (engaged by the scale-adaptive
  *            layout decision exactly when the labels side exceeds the
  *            broadcast threshold, i.e. when this sort-merge plan is the
  *            real one): checkpoint declared `HashPartitioning(v, n)`
  *            (`freshLocalCheckpointClusteredBy`) → the edge side is never
  *            re-exchanged; only the (per-round changing) labels side moves.
  *
  * Writes plans/r07/cc_round_join_smj_{before,after}.txt. The bench-scale
  * broadcast regime never paid the edge exchange — this is the 100 TB
  * posture fix, exchange-count-asserted in SparkInternalsSpec and
  * result-asserted (vs union-find, broadcast disabled) in DedupJobsSpec.
  */
object CcSetupPlan {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    implicit val spark: SparkSession = graft.spark.Sessions.local(cpus, "cc-setup-plan")
    import spark.implicits._
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val internals = org.apache.spark.sql.graft.SparkInternals

    val rnd = new java.util.Random(42)
    val pairs = Seq.fill(2000)((rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong))
      .filter { case (a, b) => a != b }.toDF("a", "b")
    val nodes = (0 until 1000).map(_.toLong).toDF("doc_id")

    def edgeUnion(pairs: DataFrame, nodes: DataFrame): DataFrame =
      pairs.select(col("a").as("u"), col("b").as("v"))
        .union(pairs.select(col("b").as("u"), col("a").as("v")))
        .select(col("u"), col("v"), lit(false).as("self"))
        .unionByName(nodes.select(col("doc_id").as("u"), col("doc_id").as("v"),
          lit(true).as("self")))

    // BEFORE (r6): distinct-based setup, partitioning lost at the checkpoint
    val edgesBefore = internals.freshLocalCheckpoint(
      pairs.select(col("a").as("u"), col("b").as("v"))
        .union(pairs.select(col("b").as("u"), col("a").as("v")))
        .distinct()
        .select(col("u"), col("v"), lit(false).as("self"))
        .unionByName(nodes.select(col("doc_id")).distinct()
          .select(col("doc_id").as("u"), col("doc_id").as("v"), lit(true).as("self"))))
    // AFTER (r7): one repartition + in-place dedup, declared HashPartitioning(v)
    val nShuffle = spark.sessionState.conf.numShufflePartitions
    val edgesAfter = internals.freshLocalCheckpointClusteredBy(
      edgeUnion(pairs, nodes).repartition(nShuffle, col("v"))
        .dropDuplicates("u", "v", "self"), key = "v")

    def roundJoin(edges: DataFrame): DataFrame = {
      val labels = internals.freshLocalCheckpoint(
        edges.where(col("self")).select(col("u").as("n"), col("u").as("lbl")))
      edges.join(labels, col("v") === labels("n"))
        .groupBy(col("u"))
        .agg(min(col("lbl")).as("new_lbl"),
          min(when(col("self"), col("lbl"))).as("old_lbl"))
    }

    def dump(df: DataFrame, path: String): Unit = {
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(java.nio.file.Paths.get(path), plan.getBytes("UTF-8"))
      val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(plan).size
      println(s"[ccplan] $path exchanges=$exchanges")
    }

    new java.io.File("plans/r07").mkdirs()
    dump(roundJoin(edgesBefore), "plans/r07/cc_round_join_smj_before.txt")
    dump(roundJoin(edgesAfter), "plans/r07/cc_round_join_smj_after.txt")
    spark.stop()
  }
}
