package graft.ann

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.dedup.{ClusterModality, IndexService, IndexTable}

/**
 * RESUMABLE incremental EMBEDDING dedup service — the `IndexService` loop
 * bound to the persisted sign-LSH embedding index (`EmbIndex`), completing
 * the near-dup service triad: text `DedupService`, image `PhashService`,
 * embeddings here. Input rows: (vec_id: Long, embedding: Array[Float]).
 * At every committed point the labels equal batch-mode `Ann.lshClusters`
 * of every vector below the cursor (EmbServiceSpec + the
 * q_emb_svc_clusters oracle).
 */
object EmbService {

  type Head = IndexService.Head

  /** The embedding modality: one sign-random-projection bucket per vector,
    * exact codegen'd-cosine verify. */
  final case class EmbLsh(threshold: Double = 0.95, nPlanes: Int = 12,
                          maxBucket: Int = Int.MaxValue)
      extends ClusterModality {
    val idCol = "vec_id"
    val tables = Seq(IndexTable("vecs", partitioned = true, "bp", "vec_id"))
    def built(idxDir: String): Boolean = Files.exists(Paths.get(idxDir, "vecs"))
    def build(batch: DataFrame, idxDir: String)(implicit s: SparkSession): Unit =
      EmbIndex.build(batch.select("vec_id", "embedding"), idxDir, nPlanes)
    def firstPairs(batch: DataFrame)(implicit s: SparkSession): DataFrame =
      Ann.lshNearDupPairs(batch, threshold, nPlanes, maxBucket).select("a", "b")
    def probe(idxDir: String, batch: DataFrame)(implicit s: SparkSession): DataFrame =
      EmbIndex.probe(idxDir, batch, threshold, nPlanes, maxBucket).select("a", "b")
    def append(batch: DataFrame, idxDir: String)(implicit s: SparkSession): Unit =
      EmbIndex.append(batch.select("vec_id", "embedding"), idxDir, nPlanes)
    def compact(idxDir: String)(implicit s: SparkSession): Unit =
      EmbIndex.compact(idxDir)
  }

  def readHead(stateDir: String): Head = IndexService.readHead(stateDir)

  def labels(stateDir: String)(implicit spark: SparkSession): DataFrame =
    IndexService.labels(stateDir)

  def recover(stateDir: String)(implicit spark: SparkSession): Unit =
    IndexService.recover(stateDir, EmbLsh())

  def run(vecs: DataFrame, stateDir: String, batchSize: Long,
          threshold: Double = 0.95, nPlanes: Int = 12,
          maxBucket: Int = Int.MaxValue, keepLabelVersions: Int = 2,
          compactEvery: Int = 0,
          labelRangeWidth: Long = IndexService.DefaultLabelRangeWidth)(
      implicit spark: SparkSession): Head =
    IndexService.run(vecs.select("vec_id", "embedding"), stateDir, batchSize,
      EmbLsh(threshold, nPlanes, maxBucket), keepLabelVersions, compactEvery,
      labelRangeWidth)
}
