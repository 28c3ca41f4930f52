package graft.dedup

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * RESUMABLE incremental dedup service — the reference's worker posture
 * (idempotent, atomic, resumable batch maintenance; heatmap-tiles
 * `Worker.cs:50-61,122-129`, whose at-least-once double-apply the tile
 * store fixes with atomic data+cursor commits) applied end-to-end to the
 * dedup pipeline. Each batch of arriving documents runs the full loop the
 * measurement harnesses validate piecewise (`LshLoopProbe`):
 *
 *   probe the persisted LSH index (pairs vs indexed corpus + in-batch)
 *   → append the batch to the index
 *   → fold the pairs into the standing clustering (`incrementalClusters`)
 *   → commit labels + cursor ATOMICALLY
 *
 * so at every committed point `labels/v<version>` is exactly the
 * batch-mode clustering of all documents below `cursor` (spec'd), and a
 * crashed batch is excised and deterministically re-run on resume.
 *
 * State layout under `stateDir`:
 *   index/bands, index/shingles   persisted LSH index (`LshIndex`)
 *   labels/v<N>/                  immutable labels versions (id, cluster_id)
 *   HEAD                          text "version cursor" — THE commit point
 *                                 (temp + ATOMIC_MOVE, like the tile store)
 *   INFLIGHT                      text "<cursor>": written before any index
 *                                 mutation, deleted after the HEAD commit
 *
 * Crash safety: every index mutation for the batch starting at `cursor`
 * happens between INFLIGHT(cursor) and the HEAD commit. On resume,
 * `recover` inspects INFLIGHT: content == HEAD.cursor means the commit
 * never happened — the half-appended batch is excised by rewriting both
 * index tables filtered to doc_id < cursor (staged two-rename, itself
 * crash-safe) and the orphan labels version is deleted; content <
 * HEAD.cursor means the commit DID land and only the marker is stale.
 * Either way the service re-enters a committed state and reprocesses
 * deterministically — exactly-once effects from at-least-once execution.
 *
 * Scale posture: per batch, probe cost is bounded by the batch's bucket
 * footprint (directory-pruned scan), the fold by batch + touched
 * clusters, and the labels rewrite is the one corpus-sized output — the
 * same O(dirty)+O(state) shape as the tile store's commits. Labels
 * versions are retained like `TileStore.gc` (keep 2).
 */
object DedupService {

  final case class Head(version: Long, cursor: Long)

  private def headFile(stateDir: String) = Paths.get(stateDir, "HEAD")
  private def inflightFile(stateDir: String) = Paths.get(stateDir, "INFLIGHT")
  private def indexDir(stateDir: String) = Paths.get(stateDir, "index").toString
  private def labelsDir(stateDir: String, v: Long) = Paths.get(stateDir, "labels", s"v$v")

  def readHead(stateDir: String): Head = {
    val f = headFile(stateDir)
    if (!Files.exists(f)) Head(0L, 0L)
    else {
      val parts = new String(Files.readAllBytes(f), "UTF-8").trim.split("\\s+")
      Head(parts(0).toLong, parts(1).toLong)
    }
  }

  private def writeAtomic(path: java.nio.file.Path, content: String): Unit =
    graft.io.AtomicWrite.write(path, content)

  /** Current committed labels (id, cluster_id); empty-schema frame before
    * the first commit. */
  def labels(stateDir: String)(implicit spark: SparkSession): DataFrame = {
    val h = readHead(stateDir)
    if (h.version == 0L) {
      import spark.implicits._
      Seq.empty[(Long, Long)].toDF("id", "cluster_id")
    } else spark.read.parquet(labelsDir(stateDir, h.version).toString)
  }

  /** Excise a batch that crashed between its first index mutation and the
    * HEAD commit (see class doc). Loud no-op when the state is clean. */
  def recover(stateDir: String)(implicit spark: SparkSession): Unit = {
    val inflight = inflightFile(stateDir)
    if (!Files.exists(inflight)) return
    val started = new String(Files.readAllBytes(inflight), "UTF-8").trim.toLong
    val head = readHead(stateDir)
    if (started == head.cursor) {
      // the batch never committed: excise its index rows + orphan labels
      val idx = indexDir(stateDir)
      if (head.version == 0L) {
        // crash during the very first build: nothing committed, drop all
        graft.stream.StreamDedup.deleteTree(idx)
      } else {
        IndexFiles.recover(idx, "bands"); IndexFiles.recover(idx, "shingles")
        IndexFiles.rewriteFiltered(idx, "bands", partitioned = true,
          col("doc_id") < head.cursor)
        IndexFiles.rewriteFiltered(idx, "shingles", partitioned = false,
          col("doc_id") < head.cursor)
      }
      graft.stream.StreamDedup.deleteTree(labelsDir(stateDir, head.version + 1).toString)
      println(s"[dedup-service] recovered: excised uncommitted batch at cursor=$started")
    }
    Files.delete(inflight)
  }

  /** Process every pending batch of `docs` (id-range batching from the
    * committed cursor; `docs` needs columns (doc_id, text); arrival
    * contract: ids are assigned monotonically — a document with an id
    * below the committed cursor arrived "in the past" and is never
    * (re)processed). Returns the committed head after draining.
    * Re-invoking with the same inputs is a no-op; invoking after new
    * documents arrive processes only the tail. `compactEvery` compacts
    * the index after every Nth committed version (0 = never) — appends
    * fragment one file per touched directory per batch, so a resident
    * service compacts periodically like any LSM-ish index. */
  def run(docs: DataFrame, stateDir: String, batchSize: Long,
          threshold: Double = 0.8, numHashes: Int = 64, bands: Int = 8,
          maxBucket: Int = Int.MaxValue, keepLabelVersions: Int = 2,
          compactEvery: Int = 0)(
      implicit spark: SparkSession): Head = {
    require(batchSize > 0, "batchSize must be positive")
    // <= 0 would compute a retention floor of head.version + 1 and delete
    // the labels version HEAD was just committed to (labels() then fails)
    require(keepLabelVersions >= 1, "keepLabelVersions must be >= 1")
    Files.createDirectories(Paths.get(stateDir, "labels"))
    recover(stateDir)
    var head = readHead(stateDir)
    val maxIdRow = docs.agg(max(col("doc_id")), min(col("doc_id"))).head()
    if (maxIdRow.isNullAt(0)) return head // nothing to do
    val maxId = maxIdRow.getLong(0)
    require(maxIdRow.getLong(1) >= 0L,
      "doc_id must be non-negative (id-range batching from 0)")
    require(maxId < Long.MaxValue - batchSize,
      s"doc_id $maxId too close to Long.MaxValue for batchSize $batchSize (cursor overflow)")
    val idx = indexDir(stateDir)
    while (head.cursor <= maxId) {
      // skip straight to the next existing id — sparse id spaces (holes,
      // snowflake-style ids) must cost one aggregation, not
      // gap/batchSize empty-range iterations
      val nextRow = docs.where(col("doc_id") >= head.cursor)
        .agg(min(col("doc_id"))).head()
      if (nextRow.isNullAt(0)) return head
      val start = nextRow.getLong(0)
      if (start > head.cursor) {
        // cursor jump over the hole: no version bump, no mutation
        writeAtomic(headFile(stateDir), s"${head.version} $start")
        head = Head(head.version, start)
      }
      val batch = docs
        .where(col("doc_id") >= head.cursor && col("doc_id") < head.cursor + batchSize)
        .select("doc_id", "text")
      val newCursor = math.min(head.cursor + batchSize, maxId + 1)
      writeAtomic(inflightFile(stateDir), head.cursor.toString)
      val built = Files.exists(Paths.get(idx, "bands"))
      val (next, batchPairs) =
        if (!built) {
          // first non-empty batch: build the index, cluster internally.
          // CC's output is already checkpoint-backed with measured stats
          LshIndex.build(batch, idx, numHashes, bands)
          val pairs = Dedup.minhashNearDups(batch, threshold, numHashes, bands, maxBucket)
          (Dedup.connectedComponents(pairs.select("a", "b"), batch.select("doc_id")),
            pairs)
        } else {
          // probe BEFORE append (probe materializes eagerly); then fold
          val pairs = LshIndex.probe(idx, batch, threshold, numHashes, bands, maxBucket)
          LshIndex.append(batch, idx, numHashes, bands)
          (Dedup.incrementalClusters(labels(stateDir), pairs.select("a", "b"),
            batch.select("doc_id")), pairs)
        }
      next.write.mode("overwrite").parquet(labelsDir(stateDir, head.version + 1).toString)
      // the write materialized the plan; release the blocks it leans on.
      // TWO releases, because CC severs lineage: `next` is a fresh
      // LogicalRDD whose release frees the fold's (or CC's) own
      // checkpoint, while the probe's (or minhashNearDups') pairs hold an
      // INDEPENDENT checkpoint that is NOT in next's plan — absent its own
      // release it would linger until ContextCleaner GC, accumulating
      // storage across a resident service's batches
      Dedup.releaseCheckpoint(next)
      Dedup.releaseCheckpoint(batchPairs)
      writeAtomic(headFile(stateDir), s"${head.version + 1} $newCursor") // commit point
      Files.delete(inflightFile(stateDir))
      // retention, after the commit (old versions are unreferenced).
      // Sweep EVERY version at-or-below the floor, not just one — a crash
      // between the commit and this delete must not strand a version
      val floor = head.version + 1 - keepLabelVersions
      Option(Paths.get(stateDir, "labels").toFile.listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.startsWith("v") &&
          f.getName.drop(1).toLongOption.exists(_ <= floor))
        .foreach(f => graft.stream.StreamDedup.deleteTree(f.getPath))
      head = Head(head.version + 1, newCursor)
      if (compactEvery > 0 && head.version % compactEvery == 0)
        LshIndex.compact(idx)
    }
    head
  }

  /** sbt -batch 'runMain graft.dedup.DedupService <sfDir> <stateDir> [batchSize] [compactEvery]'
    * Parallelism follows SPARK_GRAFT_CPUS (default 32) like Bench /
    * ServiceMain, so service drives use the protocol's parallelism. */
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: DedupService <sfDir> <stateDir> [batchSize] [compactEvery]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    implicit val spark: SparkSession = graft.spark.Sessions.local(cpus, "dedup-service")
    try {
      val docs = graft.queries.Tables.documents(spark, args(0)).select("doc_id", "text")
      val batchSize = if (args.length > 2) args(2).toLong else 500L
      val compactEvery = if (args.length > 3) args(3).toInt else 0
      val head = run(docs, args(1), batchSize, compactEvery = compactEvery)
      val lbl = labels(args(1))
      val kept = lbl.where(col("id") === col("cluster_id")).count()
      println(s"[dedup-service] head=v${head.version} cursor=${head.cursor} " +
        s"docs=${lbl.count()} kept=$kept")
    } finally spark.stop()
  }
}
