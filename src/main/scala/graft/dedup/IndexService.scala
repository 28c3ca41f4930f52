package graft.dedup

import java.nio.file.{Files, Path, Paths, StandardOpenOption}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One persisted index table of a modality: its subdir (may be nested,
  * e.g. "text/bands"), hive-partitioning, and the id column the
  * crash-excision rewrite filters on (tables of one modality can disagree
  * — the cross-signal index mixes doc_id and vec_id tables). */
final case class IndexTable(sub: String, partitioned: Boolean,
                            partCol: String, idCol: String)

/**
 * A near-dup index family pluggable into the resumable service loop: one
 * persisted, incrementally-appendable index (LshIndex / PhashIndex shape)
 * plus its pair operators. The service machinery (INFLIGHT/HEAD atomic
 * commits, crash excision, cursor batching, bucketed label store) is
 * modality-agnostic; everything hash-family-specific lives behind this
 * trait. Pairs frames must expose columns (a, b).
 */
trait ClusterModality {
  /** id column of the input rows (doc_id / id / vec_id). */
  def idCol: String
  /** Every persisted index table — the crash-excision surface
    * (`IndexFiles.rewriteFiltered`). */
  def tables: Seq[IndexTable]
  /** True once a build has produced the index under `idxDir`. */
  def built(idxDir: String): Boolean
  /** Adopt a COMMITTED index written by a pre-parameter-guard layout
    * (e.g. backfill a missing PARAMS file from this modality's configured
    * parameters — trusting the caller exactly as the legacy contract
    * did). Only called on states with a committed HEAD; no-op default. */
  def adoptLegacyIndex(idxDir: String)(implicit s: SparkSession): Unit = ()
  def build(batch: DataFrame, idxDir: String)(implicit s: SparkSession): Unit
  /** Batch-internal pairs for the FIRST batch (no index to probe yet). */
  def firstPairs(batch: DataFrame)(implicit s: SparkSession): DataFrame
  /** Pairs of `batch` vs the index AND within the batch (probe BEFORE
    * append — the shared contract of all the persisted indexes). */
  def probe(idxDir: String, batch: DataFrame)(implicit s: SparkSession): DataFrame
  def append(batch: DataFrame, idxDir: String)(implicit s: SparkSession): Unit
  def compact(idxDir: String)(implicit s: SparkSession): Unit
}

/**
 * RESUMABLE incremental near-dup service, generic over the index modality
 * (text MinHash-LSH, image pHash blocks, …) — the INFLIGHT/HEAD commit +
 * crash-excision machinery `DedupService` proved out for text, extracted
 * so every persisted index runs the same validated loop:
 *
 *   probe the persisted index (pairs vs indexed corpus + in-batch)
 *   → append the batch to the index
 *   → fold the pairs into the standing clustering (`incrementalDelta`)
 *   → commit labels + cursor ATOMICALLY
 *
 * State layout under `stateDir` (same as the original DedupService so its
 * on-disk contract and spec carry over):
 *   index/<tables>                the modality's persisted index
 *   labels/v<N>/lb=<B>/…          immutable labels versions, RANGE-BUCKETED
 *                                 by lb = cluster_id / labelRangeWidth
 *   HEAD                          text "version cursor" — THE commit point
 *   INFLIGHT                      text "<cursor>" crash marker
 *   commits.jsonl                 per-commit write metrics (metadata only)
 *
 * O(dirty) LABEL COMMITS — the labels table is hive-partitioned by the
 * RANGE bucket of cluster_id. Because cluster ids are member MINIMA and the
 * arrival contract assigns ids monotonically, a batch's self-labeled rows
 * fall into O(batchSize / width) CONTIGUOUS buckets, rows merging into old
 * clusters land in the touched clusters' buckets, and a changed cluster
 * relabels rows that all live in exactly two buckets (lb(old rep) and
 * lb(new cluster id) — new ids are minima, so moves are localized). Each
 * commit therefore rewrites ONLY the buckets containing a batch row, a
 * changed rep, or its new cluster id — bounded by O(batch + touched
 * clusters) buckets — and carries every clean bucket forward as HARDLINKS
 * (the tile store's dirty-partition commit scheme, TileStore.scala:72,
 * applied to the label relation). The closure argument making the pruned
 * rewrite exact: a row outside the dirty buckets has lb(cluster_id) not
 * dirty, hence its cluster is not in the remap, hence its label cannot
 * change; a row inside them can only move to lb(new_cluster), which is
 * dirty by construction.
 *
 * Crash safety is unchanged from DedupService (see its scaladoc): every
 * index mutation happens between INFLIGHT(cursor) and the HEAD commit;
 * recovery excises half-appended batches by rewriting the index tables
 * filtered to the committed cursor and deletes the orphan labels version
 * (hardlinked files delete like any other — links are per-version).
 *
 * O(dirty) FOLD READS — the round-6 layout accepted one corpus-sized
 * labels scan per batch (the fold's endpoint→representative lookup);
 * since round 7 a SECOND projection of the same relation,
 * `labels_by_id/v<N>/ib=<B>` with ib = id / labelRangeWidth (the id-keyed
 * dual of the cluster-keyed lb store), makes that lookup partition-pruned:
 * an endpoint's label row lives exactly in ib(endpoint), so the fold reads
 * only the endpoint set's ib buckets — O(batch pair endpoints) buckets,
 * never the corpus. The projection commits with the same dirty-only +
 * hardlink-carry scheme: a by-id row changes only when its row RELABELS
 * (it is a member of a changed cluster — all such rows are found inside
 * the lb store's dirty buckets, and their ids give the dirty ib set) or
 * when it is a batch row (contiguous ids → O(1) buckets); every clean ib
 * bucket hardlink-carries. Closure argument for exactness: a row outside
 * the dirty ib buckets has an id no relabeled-or-new row has, hence its
 * cluster is not in the remap, hence its (id, cluster_id) is unchanged —
 * carrying it is the identity. The write cost is ~2× the (already
 * dirty-sized) lb commit, the price round 6's scaladoc predicted for
 * closing the read side; per-commit read/write metrics land in
 * commits.jsonl (fold_read_rows, ib_written_dirs, ib_carried_dirs).
 */
object IndexService {

  final case class Head(version: Long, cursor: Long)

  /** Ids per label bucket. The default gives ~65k rows (~1 MB parquet) per
    * bucket on dense id spaces — small enough that a touched cluster's
    * rewrite is cheap, large enough that a billion-row corpus is ~15k
    * directories (the tile store's partition-count regime). */
  val DefaultLabelRangeWidth = 1L << 16

  private def headFile(stateDir: String) = Paths.get(stateDir, "HEAD")
  private def inflightFile(stateDir: String) = Paths.get(stateDir, "INFLIGHT")
  private def commitsFile(stateDir: String) = Paths.get(stateDir, "commits.jsonl")
  private[dedup] def indexDir(stateDir: String) = Paths.get(stateDir, "index").toString
  private def labelsDir(stateDir: String, v: Long) = Paths.get(stateDir, "labels", s"v$v")
  private[dedup] def labelsByIdDir(stateDir: String, v: Long) =
    Paths.get(stateDir, "labels_by_id", s"v$v")

  def readHead(stateDir: String): Head = {
    val f = headFile(stateDir)
    if (!Files.exists(f)) Head(0L, 0L)
    else {
      val parts = new String(Files.readAllBytes(f), "UTF-8").trim.split("\\s+")
      Head(parts(0).toLong, parts(1).toLong)
    }
  }

  private def writeAtomic(path: Path, content: String): Unit =
    graft.io.AtomicWrite.write(path, content)

  private def lbOf(width: Long)(c: Column): Column = (c / lit(width)).cast("long")

  /** Current committed labels (id, cluster_id); empty-schema frame before
    * the first commit. The lb partition column is dropped — it is physical
    * layout, not part of the relation. */
  def labels(stateDir: String)(implicit spark: SparkSession): DataFrame = {
    val h = readHead(stateDir)
    if (h.version == 0L) {
      import spark.implicits._
      Seq.empty[(Long, Long)].toDF("id", "cluster_id")
    } else spark.read.parquet(labelsDir(stateDir, h.version).toString)
      .select("id", "cluster_id")
  }

  /** Excise a batch that crashed between its first index mutation and the
    * HEAD commit. Loud no-op when the state is clean. */
  def recover(stateDir: String, modality: ClusterModality)(
      implicit spark: SparkSession): Unit = {
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
      } else modality.tables.foreach { t =>
        IndexFiles.recover(idx, t.sub)
        IndexFiles.rewriteFiltered(idx, t.sub, t.partitioned,
          col(t.idCol) < head.cursor, t.partCol)
      }
      graft.stream.StreamDedup.deleteTree(labelsDir(stateDir, head.version + 1).toString)
      graft.stream.StreamDedup.deleteTree(labelsByIdDir(stateDir, head.version + 1).toString)
      println(s"[index-service] recovered: excised uncommitted batch at cursor=$started")
    }
    Files.delete(inflight)
  }

  /** Hardlink every parquet file of `prev`'s clean buckets (dirs named
    * `<prefix><bucket>`, e.g. lb=3 / ib=3) into `next`. Returns the
    * carried-directory count. */
  private def carryClean(prev: Path, next: Path, dirty: Set[Long],
                         prefix: String = "lb="): Int = {
    var carried = 0
    Option(prev.toFile.listFiles()).getOrElse(Array.empty).foreach { d =>
      if (d.isDirectory && d.getName.startsWith(prefix) &&
          !dirty.contains(d.getName.drop(prefix.length).toLong)) {
        val dst = next.resolve(d.getName)
        Files.createDirectories(dst)
        d.listFiles().foreach { f =>
          if (f.getName.endsWith(".parquet"))
            Files.createLink(dst.resolve(f.getName), f.toPath)
        }
        carried += 1
      }
    }
    carried
  }

  private def writtenBuckets(version: Path, prefix: String = "lb="): Set[Long] =
    Option(version.toFile.listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && d.getName.startsWith(prefix))
      .map(_.getName.drop(prefix.length).toLong).toSet

  /** Migrate a state directory written by the pre-round-6 layout so the
    * scaladoc's "on-disk contract carries over" holds LITERALLY: (1) a
    * committed index without its parameter marker adopts the modality's
    * configured parameters (the legacy trust model); (2) a committed FLAT
    * labels version (no lb= bucket dirs) is rewritten range-bucketed via
    * the shared crash-safe two-rename (a crash mid-migration rolls back
    * on the next start). No-op on fresh or already-migrated state. */
  private def migrateLegacy(stateDir: String, modality: ClusterModality,
                            labelRangeWidth: Long)(
      implicit spark: SparkSession): Unit = {
    val head = readHead(stateDir)
    if (head.version == 0L) return
    modality.adoptLegacyIndex(indexDir(stateDir))
    val labelsRoot = Paths.get(stateDir, "labels").toString
    val sub = s"v${head.version}"
    IndexFiles.recover(labelsRoot, sub) // crashed-migration rollback
    val vdir = labelsDir(stateDir, head.version)
    val flat = Option(vdir.toFile.listFiles()).getOrElse(Array.empty)
      .exists(_.getName.endsWith(".parquet")) &&
      !Option(vdir.toFile.listFiles()).getOrElse(Array.empty)
        .exists(f => f.isDirectory && f.getName.startsWith("lb="))
    if (flat) {
      val lb = lbOf(labelRangeWidth) _
      IndexFiles.compactDirTransform(labelsRoot, sub, partCol = "lb",
        _.select("id", "cluster_id").withColumn("lb", lb(col("cluster_id"))))
      println(s"[index-service] migrated legacy flat labels $sub to lb buckets")
    }
  }

  /** The id-range cursor drain shared by every resumable index service
    * (this one and `graft.ann.IvfService` — ONE implementation of the
    * subtle commit protocol): min/max guards, sparse-id jumps, and the
    * INFLIGHT(cursor) → processBatch → HEAD-commit → INFLIGHT-delete
    * bracket per batch. `processBatch(batch, head, newCursor)` runs every
    * index mutation for the batch; its result feeds `afterCommit(committed
    * head, result)` — the place for retention sweeps / metrics /
    * compaction, AFTER the commit point so a crash there strands nothing.
    * The caller runs its recovery BEFORE draining. */
  private[graft] def drain[A](rows: DataFrame, idCol: String, stateDir: String,
      batchSize: Long)(
      processBatch: (DataFrame, Head, Long) => A)(
      afterCommit: (Head, A) => Unit): Head = {
    require(batchSize > 0, "batchSize must be positive")
    var head = readHead(stateDir)
    val maxIdRow = rows.agg(max(col(idCol)), min(col(idCol))).head()
    if (maxIdRow.isNullAt(0)) return head // nothing to do
    val maxId = maxIdRow.getLong(0)
    require(maxIdRow.getLong(1) >= 0L,
      s"$idCol must be non-negative (id-range batching from 0)")
    require(maxId < Long.MaxValue - batchSize,
      s"$idCol $maxId too close to Long.MaxValue for batchSize $batchSize (cursor overflow)")
    val globalMin = maxIdRow.getLong(1)
    while (head.cursor <= maxId) {
      // skip straight to the next existing id — sparse id spaces (holes,
      // snowflake-style ids) must cost one aggregation, not
      // gap/batchSize empty-range iterations. The first iteration (and any
      // resume at/below the source minimum) reuses the min already fetched
      // by the opening max/min aggregation instead of re-scanning; every
      // later iteration pays one source aggregation per batch — acceptable
      // for file-backed slices, and a resident deployment over a large
      // table should lay the source out id-partitioned so this probe (and
      // the batch filter below) prune to a handful of partitions.
      val start =
        if (head.cursor <= globalMin) globalMin
        else {
          val nextRow = rows.where(col(idCol) >= head.cursor).agg(min(col(idCol))).head()
          if (nextRow.isNullAt(0)) return head
          nextRow.getLong(0)
        }
      if (start > head.cursor) {
        // cursor jump over the hole: no version bump, no mutation
        writeAtomic(headFile(stateDir), s"${head.version} $start")
        head = Head(head.version, start)
      }
      val batch = rows
        .where(col(idCol) >= head.cursor && col(idCol) < head.cursor + batchSize)
      val newCursor = math.min(head.cursor + batchSize, maxId + 1)
      writeAtomic(inflightFile(stateDir), head.cursor.toString)
      val result = processBatch(batch, head, newCursor)
      writeAtomic(headFile(stateDir), s"${head.version + 1} $newCursor") // commit point
      Files.delete(inflightFile(stateDir))
      head = Head(head.version + 1, newCursor)
      afterCommit(head, result)
    }
    head
  }

  /** Process every pending batch of `rows` (id-range batching from the
    * committed cursor; `rows` needs `modality.idCol` plus whatever the
    * modality hashes; ids are assigned monotonically — see DedupService).
    * Returns the committed head after draining. Re-invoking with the same
    * inputs is a no-op; new arrivals process only the tail. */
  def run(rows: DataFrame, stateDir: String, batchSize: Long,
          modality: ClusterModality, keepLabelVersions: Int = 2,
          compactEvery: Int = 0, labelRangeWidth: Long = DefaultLabelRangeWidth)(
      implicit spark: SparkSession): Head = {
    import spark.implicits._
    require(keepLabelVersions >= 1, "keepLabelVersions must be >= 1")
    require(labelRangeWidth > 0, "labelRangeWidth must be positive")
    val idc = modality.idCol
    Files.createDirectories(Paths.get(stateDir, "labels"))
    recover(stateDir, modality)
    val idx = indexDir(stateDir)
    // a compaction that crashed between its two renames (post-commit, so
    // INFLIGHT is gone and recover() above won't see it) leaves no live
    // table dir + a .old backup; roll it back BEFORE built() looks, or the
    // missing dir reads as "first build" and the batch-only labeling would
    // overwrite the standing labels
    modality.tables.foreach(t => IndexFiles.recover(idx, t.sub))
    migrateLegacy(stateDir, modality, labelRangeWidth)
    val lb = lbOf(labelRangeWidth) _
    val ib = lbOf(labelRangeWidth) _ // same range-bucket fn, keyed by id
    backfillByIdProjection(stateDir, labelRangeWidth)
    drain(rows, idc, stateDir, batchSize) { (batch, head, _) =>
      val vdir = labelsDir(stateDir, head.version + 1)
      val ibVdir = labelsByIdDir(stateDir, head.version + 1)
      if (!modality.built(idx)) {
        // first non-empty batch: build the index, cluster internally,
        // write the FULL labeling (every bucket is dirty by definition)
        // into BOTH projections
        modality.build(batch, idx)
        val pairs = modality.firstPairs(batch)
        val full = Dedup.connectedComponents(pairs.select("a", "b"), batch.select(idc))
        val obs = org.apache.spark.sql.Observation()
        full.withColumn("lb", lb(col("cluster_id")))
          .observe(obs, count(lit(1)).as("rows"))
          .repartition(col("lb"))
          .write.mode("overwrite").partitionBy("lb").parquet(vdir.toString)
        full.withColumn("ib", ib(col("id")))
          .repartition(col("ib"))
          .write.mode("overwrite").partitionBy("ib").parquet(ibVdir.toString)
        Dedup.releaseCheckpoint(full)
        Dedup.releaseCheckpoint(pairs)
        CommitMetrics(writtenBuckets(vdir).size, 0,
          obs.get("rows").asInstanceOf[Long],
          writtenBuckets(ibVdir, "ib=").size, 0, 0L)
      } else {
        // probe BEFORE append (probe materializes eagerly); then fold
        // the delta and rewrite ONLY the dirty label buckets
        val pairs = modality.probe(idx, batch)
        modality.append(batch, idx)
        val prevLabels = spark.read.parquet(labelsDir(stateDir, head.version).toString)
        val prevById = spark.read.parquet(labelsByIdDir(stateDir, head.version).toString)
        // O(dirty) FOLD READ: the endpoint→representative lookup only needs
        // label rows whose id is a pair endpoint, and such a row lives
        // exactly in ib(endpoint) — prune the id-keyed projection to the
        // endpoint set's buckets (one tiny aggregation over the eager probe
        // result, footprint bounded by the pair count) instead of scanning
        // the corpus-sized labels relation per batch
        val endpointIbs: Seq[Long] = pairs.select(ib(col("a")).as("i"))
          .union(pairs.select(ib(col("b")).as("i")))
          .distinct().as[Long].collect().toSeq
        val foldLabels = prevById
          .where(col("ib").isin(endpointIbs.map(java.lang.Long.valueOf): _*))
          .select("id", "cluster_id")
        val foldReadRows = foldLabels.count() // metric: label rows the fold reads
        val (remap, newRows) = Dedup.incrementalDelta(
          foldLabels, pairs.select("a", "b"), batch.select(idc))
        // remap is CC output (checkpoint-backed, O(batch + touched));
        // `changed` drops the untouched reps / self-labeled batch ids —
        // only actual moves dirty old buckets
        val changed = remap.where(col("rep") =!= col("new_cluster"))
        val dirty: Set[Long] = changed.select(lb(col("rep")).as("l"))
          .union(changed.select(lb(col("new_cluster")).as("l")))
          .union(newRows.select(lb(col("cluster_id")).as("l")))
          .distinct().as[Long].collect().toSet // bounded by O(batch + touched)
        // partition-pruned read of the dirty buckets; apply the remap
        // inside them; batch rows append into their (dirty) buckets.
        // The JOINED frame (old cluster_id + remap target) persists: it
        // feeds the lb write AND the dirty-ib discovery below
        val dirtyOldJoined = prevLabels
          .where(col("lb").isin(dirty.toSeq.map(java.lang.Long.valueOf): _*))
          .join(broadcast(changed), col("cluster_id") === col("rep"), "left")
          .persist()
        val dirtyOld = dirtyOldJoined
          .select(col("id"),
            coalesce(col("new_cluster"), col("cluster_id")).as("cluster_id"))
        val obs = org.apache.spark.sql.Observation()
        dirtyOld.unionByName(newRows.select("id", "cluster_id"))
          .withColumn("lb", lb(col("cluster_id")))
          .observe(obs, count(lit(1)).as("rows"))
          .repartition(col("lb"))
          .write.mode("overwrite").partitionBy("lb").parquet(vdir.toString)
        val written = writtenBuckets(vdir)
        require(written.subsetOf(dirty),
          s"label rewrite emitted rows outside its dirty buckets (would " +
            s"duplicate hardlink-carried data): ${(written -- dirty).take(5)}")
        val carried = carryClean(labelsDir(stateDir, head.version), vdir, dirty)
        // by-id projection commit: a by-id row changes only when it
        // RELABELS (all such rows join a non-null remap target inside the
        // lb store's dirty buckets — their ids give the dirty ib set) or
        // is a batch row; rewrite exactly those buckets, carry the rest as
        // hardlinks (closure argument in the class scaladoc)
        val dirtyIb: Set[Long] = dirtyOldJoined
          .where(col("new_cluster").isNotNull)
          .select(ib(col("id")).as("i"))
          .union(newRows.select(ib(col("id")).as("i")))
          .distinct().as[Long].collect().toSet
        val dirtyById = prevById
          .where(col("ib").isin(dirtyIb.toSeq.map(java.lang.Long.valueOf): _*))
          .join(broadcast(changed), col("cluster_id") === col("rep"), "left")
          .select(col("id"),
            coalesce(col("new_cluster"), col("cluster_id")).as("cluster_id"))
        dirtyById.unionByName(newRows.select("id", "cluster_id"))
          .withColumn("ib", ib(col("id")))
          .repartition(col("ib"))
          .write.mode("overwrite").partitionBy("ib").parquet(ibVdir.toString)
        val ibWritten = writtenBuckets(ibVdir, "ib=")
        require(ibWritten.subsetOf(dirtyIb),
          s"by-id rewrite emitted rows outside its dirty buckets: " +
            s"${(ibWritten -- dirtyIb).take(5)}")
        val ibCarried = carryClean(labelsByIdDir(stateDir, head.version),
          ibVdir, dirtyIb, "ib=")
        dirtyOldJoined.unpersist()
        Dedup.releaseCheckpoint(remap)
        Dedup.releaseCheckpoint(pairs)
        CommitMetrics(written.size, carried, obs.get("rows").asInstanceOf[Long],
          ibWritten.size, ibCarried, foldReadRows)
      }
    } { case (committed, m) =>
      // metrics AFTER the commit (metadata only, not part of the commit)
      Files.write(commitsFile(stateDir),
        (s"""{"version": ${committed.version}, "cursor": ${committed.cursor}, """ +
          s""""written_dirs": ${m.writtenDirs}, "carried_dirs": ${m.carriedDirs}, """ +
          s""""written_rows": ${m.writtenRows}, """ +
          s""""ib_written_dirs": ${m.ibWrittenDirs}, "ib_carried_dirs": ${m.ibCarriedDirs}, """ +
          s""""fold_read_rows": ${m.foldReadRows}}""" + "\n").getBytes("UTF-8"),
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
      // retention, after the commit (old versions are unreferenced).
      // Sweep EVERY version at-or-below the floor, not just one — a crash
      // between the commit and this delete must not strand a version
      val floor = committed.version - keepLabelVersions
      Seq("labels", "labels_by_id").foreach { root =>
        Option(Paths.get(stateDir, root).toFile.listFiles()).getOrElse(Array.empty)
          .filter(f => f.getName.startsWith("v") &&
            f.getName.drop(1).toLongOption.exists(_ <= floor))
          .foreach(f => graft.stream.StreamDedup.deleteTree(f.getPath))
      }
      if (compactEvery > 0 && committed.version % compactEvery == 0)
        modality.compact(idx)
    }
  }

  /** Per-commit write/read metrics threaded from the batch processor to
    * the post-commit metadata append. */
  private final case class CommitMetrics(writtenDirs: Int, carriedDirs: Int,
      writtenRows: Long, ibWrittenDirs: Int, ibCarriedDirs: Int,
      foldReadRows: Long)

  /** One-time migration for states committed before the id-keyed
    * projection existed: derive `labels_by_id/v<HEAD>` from the committed
    * lb store. Crash-safe via build-into-hidden-dir + atomic rename (a
    * half-built `.build_*` leftover is swept on the next start). No-op on
    * fresh or already-projected state. */
  private def backfillByIdProjection(stateDir: String, labelRangeWidth: Long)(
      implicit spark: SparkSession): Unit = {
    val head = readHead(stateDir)
    val root = Paths.get(stateDir, "labels_by_id")
    Option(root.toFile.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith(".build_"))
      .foreach(f => graft.stream.StreamDedup.deleteTree(f.getPath))
    if (head.version == 0L || Files.exists(labelsByIdDir(stateDir, head.version))) return
    val tmp = root.resolve(s".build_v${head.version}")
    labels(stateDir)
      .withColumn("ib", lbOf(labelRangeWidth)(col("id")))
      .repartition(col("ib"))
      .write.mode("overwrite").partitionBy("ib").parquet(tmp.toString)
    Files.move(tmp, labelsByIdDir(stateDir, head.version),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    println(s"[index-service] backfilled id-keyed labels projection v${head.version}")
  }

  /** One parsed commits.jsonl record; the ib/fold fields are -1 for lines
    * written before the id-keyed projection existed. */
  final case class CommitStat(version: Long, cursor: Long, writtenDirs: Int,
      carriedDirs: Int, writtenRows: Long, ibWrittenDirs: Int,
      ibCarriedDirs: Int, foldReadRows: Long)

  /** Full per-commit metric records including the by-id projection's write
    * counts and the fold's pruned read volume — the evidence surface for
    * BOTH O(dirty) contracts (commit writes ∝ dirty, fold reads ∝ batch
    * endpoints). */
  def commitStatsV2(stateDir: String): Seq[CommitStat] = {
    val f = commitsFile(stateDir)
    if (!Files.exists(f)) Seq.empty
    else {
      import scala.jdk.CollectionConverters._
      Files.readAllLines(f).asScala.toSeq.filter(_.nonEmpty).flatMap { line =>
        def grab(k: String): Option[String] = {
          val at = line.indexOf(s""""$k": """)
          if (at < 0) None
          else Some(line.substring(at + k.length + 4).takeWhile(c => c.isDigit || c == '-'))
            .filter(_.nonEmpty)
        }
        val parsed = for {
          v <- grab("version").flatMap(_.toLongOption)
          c <- grab("cursor").flatMap(_.toLongOption)
          w <- grab("written_dirs").flatMap(_.toIntOption)
          cd <- grab("carried_dirs").flatMap(_.toIntOption)
          wr <- grab("written_rows").flatMap(_.toLongOption)
        } yield CommitStat(v, c, w, cd, wr,
          grab("ib_written_dirs").flatMap(_.toIntOption).getOrElse(-1),
          grab("ib_carried_dirs").flatMap(_.toIntOption).getOrElse(-1),
          grab("fold_read_rows").flatMap(_.toLongOption).getOrElse(-1L))
        if (parsed.isEmpty)
          println(s"[index-service] dropping unparseable commits.jsonl line " +
            s"(truncated crash remnant?): ${line.take(120)}")
        parsed
      }
    }
  }

  /** The per-commit metric records (version, cursor, written_dirs,
    * carried_dirs, written_rows), oldest first — the evidence surface for
    * the O(dirty) commit contract (see `commitStatsV2` for the by-id
    * projection and fold-read fields). */
  def commitStats(stateDir: String): Seq[(Long, Long, Int, Int, Long)] =
    commitStatsV2(stateDir).map(s =>
      (s.version, s.cursor, s.writtenDirs, s.carriedDirs, s.writtenRows))
}
