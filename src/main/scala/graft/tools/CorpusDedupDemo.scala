package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * The full training-corpus dedup pipeline, end to end, in one command —
 * what a user of this library actually runs before training:
 *
 *   TEXT : documents → exact dedup (md5 group) → near-dup cluster
 *          resolution (inverted-index Jaccard pairs → connected
 *          components) → applyKeepList → the kept corpus
 *   IMAGE: images → pHash → exact hamming pairs → phashClusters →
 *          keep-list
 *
 * Prints before/after counts at every stage. All stages are the
 * DuckDB-oracled catalog operators (q_d1/q_d6/q_d7/q_d9,
 * q_img_phash_neardups/q_img_dedup_clusters).
 */
object CorpusDedupDemo {
  def main(args: Array[String]): Unit = {
    implicit val spark: SparkSession = graft.spark.Sessions.local(32, "corpus-dedup")
    import spark.implicits._
    val sfDir = if (args.nonEmpty) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    // ---- text ----
    val docs = graft.queries.Tables.documents(spark, sfDir)
      .select("doc_id", "text", "lang").persist()
    val n = docs.count()
    val exactGroups = docs.groupBy(md5(col("text").cast("binary")))
      .agg(count(lit(1)).as("c")).count()
    val clusters = graft.dedup.Dedup.dedupClusters(
      docs.select("doc_id", "text"), threshold = 0.7)
    val nClusters = clusters.select("cluster_id").distinct().count()
    val kept = graft.dedup.Dedup.applyKeepList(docs, clusters)
    val keptN = kept.count()
    println(f"[corpus] text: docs=$n exact_groups=$exactGroups near_dup_clusters=$nClusters " +
      f"kept=$keptN dropped=${n - keptN} (${(n - keptN) * 100.0 / n}%.1f%%)")
    val byLang = kept.groupBy("lang").agg(count(lit(1)).as("kept")).orderBy("lang")
      .as[(String, Long)].collect()
    println(s"[corpus] text kept by lang: ${byLang.map { case (l, k) => s"$l=$k" }.mkString(" ")}")

    // ---- image ----
    val nImgs = 512L
    val imgs = spark.range(nImgs).as[Long]
      .map(i => (i, graft.synth.ImageSynth.plantedPhash(i))).toDF("id", "phash")
    val imgClusters = graft.dedup.Dedup.phashClusters(imgs, maxDist = 3)
    val imgKept = imgClusters.where(col("id") === col("cluster_id")).count()
    println(f"[corpus] image: imgs=$nImgs kept=$imgKept dropped=${nImgs - imgKept} " +
      f"(${(nImgs - imgKept) * 100.0 / nImgs}%.1f%%)")
    docs.unpersist()
    spark.stop()
  }
}
