package graft.ann

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * RESUMABLE IVF index maintenance — the embedding leg of the service triad
 * (text `DedupService`, image `PhashService`, embeddings here). The IVF
 * index carries no clustering state, so this service is the
 * commit-machinery subset: id-range batching from a committed cursor,
 * INFLIGHT/HEAD atomic commits, and crash EXCISION of half-appended
 * batches — closing `Ann.appendIvf`'s documented non-atomic /
 * non-idempotent gap (a crash mid-append left a partially visible batch;
 * a blind retry duplicated vec_ids).
 *
 * State layout under `stateDir`:
 *   index/centroids, index/vectors  the persisted IVF index (`Ann`)
 *   HEAD                            text "version cursor" — the commit point
 *   INFLIGHT                        text "<cursor>" crash marker
 *
 * Recovery mirrors the dedup services: INFLIGHT == HEAD.cursor means the
 * batch never committed — its vectors are excised by rewriting the list
 * table filtered to vec_id < cursor (crash-safe two-rename); a first-build
 * crash drops the whole index. After recovery a re-run reprocesses the
 * batch deterministically — exactly-once index contents from
 * at-least-once execution (IvfServiceSpec injects both crash points).
 */
object IvfService {

  final case class Head(version: Long, cursor: Long)

  private def headFile(stateDir: String) = Paths.get(stateDir, "HEAD")
  private def inflightFile(stateDir: String) = Paths.get(stateDir, "INFLIGHT")
  def indexDir(stateDir: String): String = Paths.get(stateDir, "index").toString

  def readHead(stateDir: String): Head = {
    val f = headFile(stateDir)
    if (!Files.exists(f)) Head(0L, 0L)
    else {
      val parts = new String(Files.readAllBytes(f), "UTF-8").trim.split("\\s+")
      Head(parts(0).toLong, parts(1).toLong)
    }
  }

  /** Excise a batch that crashed between its first index mutation and the
    * HEAD commit. No-op when the state is clean. */
  def recover(stateDir: String)(implicit spark: SparkSession): Unit = {
    val inflight = inflightFile(stateDir)
    if (!Files.exists(inflight)) return
    val started = new String(Files.readAllBytes(inflight), "UTF-8").trim.toLong
    val head = readHead(stateDir)
    if (started == head.cursor) {
      val idx = indexDir(stateDir)
      if (head.version == 0L) graft.stream.StreamDedup.deleteTree(idx)
      else {
        graft.dedup.IndexFiles.recover(idx, "vectors")
        graft.dedup.IndexFiles.rewriteFiltered(idx, "vectors", partitioned = true,
          col("vec_id") < head.cursor, partCol = "list_id")
      }
      println(s"[ivf-service] recovered: excised uncommitted batch at cursor=$started")
    }
    Files.delete(inflight)
  }

  /** Drain every pending batch of `vecs` (columns (vec_id, embedding); ids
    * assigned monotonically). The first non-empty batch BUILDS the index
    * (trains centroids); later batches append with frozen centroids —
    * production IVF's posture (retraining is a rebuild). `compactEvery`
    * compacts the fragmented list table after every Nth committed version. */
  def run(vecs: DataFrame, stateDir: String, batchSize: Long, nLists: Int = 16,
          iters: Int = 3, compactEvery: Int = 0)(
      implicit spark: SparkSession): Head = {
    require(batchSize > 0, "batchSize must be positive")
    Files.createDirectories(Paths.get(stateDir))
    recover(stateDir)
    var head = readHead(stateDir)
    val maxIdRow = vecs.agg(max(col("vec_id")), min(col("vec_id"))).head()
    if (maxIdRow.isNullAt(0)) return head
    val maxId = maxIdRow.getLong(0)
    require(maxIdRow.getLong(1) >= 0L, "vec_id must be non-negative")
    require(maxId < Long.MaxValue - batchSize,
      s"vec_id $maxId too close to Long.MaxValue for batchSize $batchSize")
    val idx = indexDir(stateDir)
    while (head.cursor <= maxId) {
      val nextRow = vecs.where(col("vec_id") >= head.cursor)
        .agg(min(col("vec_id"))).head()
      if (nextRow.isNullAt(0)) return head
      val start = nextRow.getLong(0)
      if (start > head.cursor) { // sparse-id jump, no mutation
        graft.io.AtomicWrite.write(headFile(stateDir), s"${head.version} $start")
        head = Head(head.version, start)
      }
      val batch = vecs
        .where(col("vec_id") >= head.cursor && col("vec_id") < head.cursor + batchSize)
        .select("vec_id", "embedding")
      val newCursor = math.min(head.cursor + batchSize, maxId + 1)
      graft.io.AtomicWrite.write(inflightFile(stateDir), head.cursor.toString)
      if (!Files.exists(Paths.get(idx, "NLISTS"))) Ann.buildIvfIndex(batch, idx, nLists, iters)
      else Ann.appendIvf(batch, idx)
      graft.io.AtomicWrite.write(headFile(stateDir), s"${head.version + 1} $newCursor")
      Files.delete(inflightFile(stateDir))
      head = Head(head.version + 1, newCursor)
      if (compactEvery > 0 && head.version % compactEvery == 0) Ann.compactIvf(idx)
    }
    head
  }
}
