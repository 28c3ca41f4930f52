package graft.dedup

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/**
 * Shared file maintenance for the persisted incremental indexes
 * (`LshIndex`, `PhashIndex`, `Ann`'s IVF): append fragments their
 * hive-partitioned tables one file per touched directory per batch, so
 * probes open ~batches files per directory until a compaction rewrite.
 */
private[graft] object IndexFiles {

  /** Rewrite `dir/sub` to one file per `partCol` partition (or one file
    * total when unpartitioned). Crash-safe by a two-rename swap: the
    * rewrite stages into `sub.compacting`, then live→`sub.old`,
    * staged→live, backup deleted. A crash between the renames leaves NO
    * live dir plus the `.old` backup, which `recover` rolls back — never
    * a mixed layout. */
  def compactDir(dir: String, sub: String, partitioned: Boolean,
                 partCol: String = "bpb")(
      implicit spark: SparkSession): Unit =
    stagedRewrite(dir, sub, partitioned, partCol, identity)

  /** Rewrite `dir/sub` keeping only rows matching `pred` — the crash
    * recovery behind `DedupService`: a batch half-appended before the
    * HEAD commit is excised by rewriting both index tables filtered to
    * the committed cursor. Same two-rename crash safety as compaction
    * (and, like it, rolled back by `recover` if interrupted). */
  def rewriteFiltered(dir: String, sub: String, partitioned: Boolean,
                      pred: org.apache.spark.sql.Column, partCol: String = "bpb")(
      implicit spark: SparkSession): Unit =
    stagedRewrite(dir, sub, partitioned, partCol, _.where(pred))

  /** Rewrite `dir/sub` through an arbitrary transform, partitioned by
    * `partCol` (which the transform may introduce) — the legacy-layout
    * migration behind `IndexService.migrateLegacy`. Same two-rename crash
    * safety as compaction. */
  def compactDirTransform(dir: String, sub: String, partCol: String,
                          transform: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)(
      implicit spark: SparkSession): Unit =
    stagedRewrite(dir, sub, partitioned = true, partCol, transform)

  private def stagedRewrite(dir: String, sub: String, partitioned: Boolean,
                            partCol: String,
                            transform: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)(
      implicit spark: SparkSession): Unit = {
    val live = java.nio.file.Paths.get(dir, sub)
    val tmp = java.nio.file.Paths.get(dir, s"$sub.compacting")
    val old = java.nio.file.Paths.get(dir, s"$sub.old")
    graft.stream.StreamDedup.deleteTree(tmp.toString)
    graft.stream.StreamDedup.deleteTree(old.toString)
    val df = transform(spark.read.parquet(live.toString))
    val writer =
      if (partitioned) df.repartition(col(partCol)).write.partitionBy(partCol)
      else df.coalesce(1).write
    writer.mode("overwrite").parquet(tmp.toString)
    java.nio.file.Files.move(live, old)
    java.nio.file.Files.move(tmp, live)
    graft.stream.StreamDedup.deleteTree(old.toString)
  }

  /** Roll back a compaction that crashed between its two renames (no
    * live dir, `.old` backup present). Cheap no-op otherwise; probes
    * call this first. */
  def recover(dir: String, sub: String): Unit = {
    val live = java.nio.file.Paths.get(dir, sub)
    val old = java.nio.file.Paths.get(dir, s"$sub.old")
    if (!java.nio.file.Files.exists(live) && java.nio.file.Files.exists(old))
      java.nio.file.Files.move(old, live)
  }
}
