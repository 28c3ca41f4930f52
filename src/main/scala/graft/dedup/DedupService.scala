package graft.dedup

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * RESUMABLE incremental dedup service — the reference's worker posture
 * (idempotent, atomic, resumable batch maintenance; heatmap-tiles
 * `Worker.cs:50-61,122-129`, whose at-least-once double-apply the tile
 * store fixes with atomic data+cursor commits) applied end-to-end to the
 * TEXT dedup pipeline. Since round 6 this is a thin binding of the
 * modality-generic `IndexService` loop (probe → append → fold → atomic
 * labels+cursor commit, O(dirty) bucketed label commits, crash excision —
 * see IndexService's scaladoc for the machinery) to the MinHash-LSH index:
 * the image pHash service (`PhashService`) runs the identical engine.
 *
 * At every committed point `labels/v<version>` is exactly the batch-mode
 * clustering of all documents below `cursor` (spec'd), and a crashed batch
 * is excised and deterministically re-run on resume.
 */
object DedupService {

  type Head = IndexService.Head
  val Head: IndexService.Head.type = IndexService.Head

  /** The text modality: MinHash-LSH banded index (bands + shingles
    * tables), exact-Jaccard refined pairs. */
  final case class TextLsh(threshold: Double = 0.8, numHashes: Int = 64,
                           bands: Int = 8, maxBucket: Int = Int.MaxValue)
      extends ClusterModality {
    val idCol = "doc_id"
    val tables = Seq(IndexTable("bands", partitioned = true, "bpb", "doc_id"),
      IndexTable("shingles", partitioned = false, "bpb", "doc_id"))
    def built(idxDir: String): Boolean = Files.exists(Paths.get(idxDir, "bands"))
    def build(batch: DataFrame, idxDir: String)(implicit s: SparkSession): Unit =
      LshIndex.build(batch, idxDir, numHashes, bands)
    def firstPairs(batch: DataFrame)(implicit s: SparkSession): DataFrame =
      Dedup.minhashNearDups(batch, threshold, numHashes, bands, maxBucket)
    def probe(idxDir: String, batch: DataFrame)(implicit s: SparkSession): DataFrame =
      LshIndex.probe(idxDir, batch, threshold, numHashes, bands, maxBucket)
    def append(batch: DataFrame, idxDir: String)(implicit s: SparkSession): Unit =
      LshIndex.append(batch, idxDir, numHashes, bands)
    def compact(idxDir: String)(implicit s: SparkSession): Unit =
      LshIndex.compact(idxDir)
    /** A pre-round-6 committed LSH index never wrote PARAMS; backfill it
      * from this modality's configuration (the legacy contract trusted the
      * caller to pass build-consistent parameters — adoption preserves
      * exactly that trust, once, and the guard takes over after). */
    override def adoptLegacyIndex(idxDir: String)(implicit s: SparkSession): Unit = {
      val params = java.nio.file.Paths.get(idxDir, "PARAMS")
      if (built(idxDir) && !Files.exists(params)) {
        // Adoption converts an unguarded legacy state into a PARAMS-certified
        // one on trust — say so loudly, with the parameters being assumed, so
        // a mismatched legacy index (built under different numHashes/bands)
        // is diagnosable from the log if probes later lose recall.
        println(s"[dedup-service] ADOPTING legacy LSH index at $idxDir without a " +
          s"PARAMS record: ASSUMING numHashes=$numHashes bands=$bands " +
          s"prefixBuckets=${LshIndex.PrefixBuckets} (the pre-PARAMS contract " +
          "trusted the caller; verify these match the original build)")
        java.nio.file.Files.write(params,
          s"$numHashes $bands ${LshIndex.PrefixBuckets}".getBytes("UTF-8"))
      }
    }
  }

  def readHead(stateDir: String): Head = IndexService.readHead(stateDir)

  /** Current committed labels (id, cluster_id). */
  def labels(stateDir: String)(implicit spark: SparkSession): DataFrame =
    IndexService.labels(stateDir)

  /** Excise a crashed batch (see IndexService.recover). Parameters other
    * than the table layout are irrelevant to excision. */
  def recover(stateDir: String)(implicit spark: SparkSession): Unit =
    IndexService.recover(stateDir, TextLsh())

  /** Process every pending batch of `docs` (columns (doc_id, text); ids
    * assigned monotonically). Returns the committed head after draining.
    * Re-invoking with the same inputs is a no-op. */
  def run(docs: DataFrame, stateDir: String, batchSize: Long,
          threshold: Double = 0.8, numHashes: Int = 64, bands: Int = 8,
          maxBucket: Int = Int.MaxValue, keepLabelVersions: Int = 2,
          compactEvery: Int = 0,
          labelRangeWidth: Long = IndexService.DefaultLabelRangeWidth)(
      implicit spark: SparkSession): Head =
    IndexService.run(docs.select("doc_id", "text"), stateDir, batchSize,
      TextLsh(threshold, numHashes, bands, maxBucket),
      keepLabelVersions, compactEvery, labelRangeWidth)

  /** sbt -batch 'runMain graft.dedup.DedupService <sfDir> <stateDir> [batchSize] [compactEvery] [labelRangeWidth]'
    * Parallelism follows SPARK_GRAFT_CPUS (default 32) like Bench /
    * ServiceMain, so service drives use the protocol's parallelism.
    * `labelRangeWidth` sizes the label buckets to the corpus (the default
    * targets billion-row id spaces; a small drive passes ~batchSize so the
    * O(dirty) commit shape is visible at sandbox scale). */
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: DedupService <sfDir> <stateDir> [batchSize] [compactEvery] [labelRangeWidth]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    implicit val spark: SparkSession = graft.spark.Sessions.local(cpus, "dedup-service")
    try {
      val docs = graft.queries.Tables.documents(spark, args(0)).select("doc_id", "text")
      val batchSize = if (args.length > 2) args(2).toLong else 500L
      val compactEvery = if (args.length > 3) args(3).toInt else 0
      val width = if (args.length > 4) args(4).toLong else IndexService.DefaultLabelRangeWidth
      val head = run(docs, args(1), batchSize, compactEvery = compactEvery,
        labelRangeWidth = width)
      val lbl = labels(args(1))
      val kept = lbl.where(col("id") === col("cluster_id")).count()
      val stats = IndexService.commitStats(args(1))
      val dirs = stats.map(s => s"${s._3}w+${s._4}c/${s._5}r").mkString(",")
      println(s"[dedup-service] head=v${head.version} cursor=${head.cursor} " +
        s"docs=${lbl.count()} kept=$kept commits(written+carried/rows)=[$dirs]")
    } finally spark.stop()
  }
}
