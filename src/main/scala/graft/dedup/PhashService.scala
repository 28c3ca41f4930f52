package graft.dedup

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * RESUMABLE incremental IMAGE dedup service — the `IndexService` loop
 * (probe → append → fold → atomic labels+cursor commit, crash excision,
 * O(dirty) bucketed label commits) bound to the persisted perceptual-hash
 * block index. Completes the service story round 5 left text-only: the
 * image loop the `PhashLoopProbe` harness validated piecewise now runs
 * under the same INFLIGHT/HEAD machinery, so a crash mid-append on the
 * image index is excised automatically instead of needing manual recovery.
 *
 * Input rows: (id: Long, phash: Long) — callers hash bytes upstream with
 * `ImageOps.computePhashes` (the q_img_dedup_e2e path). At every committed
 * point the labels equal batch-mode `Dedup.phashClusters` of every image
 * below the cursor (PhashServiceSpec + the q_img_svc_clusters oracle).
 */
object PhashService {

  type Head = IndexService.Head

  /** The image modality: pigeonhole block index, exact hamming pairs. */
  final case class PhashBlocks(maxDist: Int = 3, maxBucket: Int = Int.MaxValue)
      extends ClusterModality {
    val idCol = "id"
    val tables = Seq(IndexTable("blocks", partitioned = true, "bpb", "id"))
    def built(idxDir: String): Boolean = Files.exists(Paths.get(idxDir, "blocks"))
    def build(batch: DataFrame, idxDir: String)(implicit s: SparkSession): Unit =
      PhashIndex.build(batch.select("id", "phash"), idxDir, maxDist)
    def firstPairs(batch: DataFrame)(implicit s: SparkSession): DataFrame =
      Dedup.phashNearDups(batch, maxDist, maxBucket).select("a", "b")
    def probe(idxDir: String, batch: DataFrame)(implicit s: SparkSession): DataFrame =
      PhashIndex.probe(idxDir, batch, maxDist, maxBucket).select("a", "b")
    def append(batch: DataFrame, idxDir: String)(implicit s: SparkSession): Unit =
      PhashIndex.append(batch.select("id", "phash"), idxDir, maxDist)
    def compact(idxDir: String)(implicit s: SparkSession): Unit =
      PhashIndex.compact(idxDir)
  }

  def readHead(stateDir: String): Head = IndexService.readHead(stateDir)

  def labels(stateDir: String)(implicit spark: SparkSession): DataFrame =
    IndexService.labels(stateDir)

  def recover(stateDir: String)(implicit spark: SparkSession): Unit =
    IndexService.recover(stateDir, PhashBlocks())

  def run(imgs: DataFrame, stateDir: String, batchSize: Long, maxDist: Int = 3,
          maxBucket: Int = Int.MaxValue, keepLabelVersions: Int = 2,
          compactEvery: Int = 0,
          labelRangeWidth: Long = IndexService.DefaultLabelRangeWidth)(
      implicit spark: SparkSession): Head =
    IndexService.run(imgs.select("id", "phash"), stateDir, batchSize,
      PhashBlocks(maxDist, maxBucket), keepLabelVersions, compactEvery,
      labelRangeWidth)
}
