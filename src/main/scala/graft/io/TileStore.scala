package graft.io

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/**
 * Versioned parquet tile store with atomic HEAD commits, per-batch lineage
 * and per-partition metrics — the engine's checkpointed state
 * (re-expressing the reference's file-per-tile store + state.json cursor,
 * `/root/reference/src/HeatMap.Tiles/HeatMap.cs:146-170`,
 * `Service/State.cs:8-15`, `Worker.cs:65-74,126-129`) with the semantics
 * the reference lacks: idempotent, atomic, resumable (the reference
 * re-applies uncommitted work at-least-once and double-counts —
 * Worker.cs:122-129; we commit data + cursor atomically instead).
 *
 * Layout under `root`:
 *   <name>/v<N>/...parquet      immutable snapshot versions
 *   HEAD                        text: committed version number
 *   commits.jsonl               one JSON line per committed batch:
 *                               batch id-window, row/byte metrics per
 *                               relation and per partition (lineage)
 *
 * Readers resolve HEAD → version dir; a crash mid-write leaves a dangling
 * v<N+1> directory that is never referenced and is overwritten by the
 * retried batch. (On a cluster this maps 1:1 onto an Iceberg table commit;
 * plain parquet + HEAD keeps the sandbox dependency-free.)
 */
class TileStore(root: String)(implicit spark: SparkSession) {
  private val rootPath = Paths.get(root)
  Files.createDirectories(rootPath)

  private def headFile = rootPath.resolve("HEAD")
  private def commitsFile = rootPath.resolve("commits.jsonl")

  def currentVersion: Long =
    if (Files.exists(headFile)) new String(Files.readAllBytes(headFile), StandardCharsets.UTF_8).trim.toLong
    else 0L

  def snapshotPath(name: String, version: Long = currentVersion): String =
    rootPath.resolve(name).resolve(s"v$version").toString

  def hasSnapshot(name: String, version: Long = currentVersion): Boolean =
    Files.exists(Paths.get(snapshotPath(name, version), "_SUCCESS"))

  /** Read a snapshot. `schema` makes empty snapshots readable (a relation
    * legitimately empty after a batch writes only _SUCCESS — parquet can't
    * infer a schema from zero files). */
  def read(name: String, schema: Option[StructType] = None): Option[DataFrame] =
    if (currentVersion > 0 && hasSnapshot(name)) {
      val reader = schema.fold(spark.read)(sc => spark.read.schema(sc))
      Some(reader.parquet(snapshotPath(name)))
    } else None

  /** S4 — tile point lookup: the global relation pruned to one (z, tx, ty)
    * tile. z is a physical partition (directory pruning); tx/ty prune via
    * parquet min/max row-group stats. */
  def tile(z: Int, tx: Long, ty: Long, res: Int = 512,
           schema: Option[StructType] = None): Option[DataFrame] =
    read("global", schema).map { g =>
      import org.apache.spark.sql.functions._
      g.where(col("z") === z &&
        floor(col("gx") / res) === tx && floor(col("gy") / res) === ty)
    }

  /** S5 — tile enumeration: distinct (z, tx, ty) with data (fixes the
    * reference's glob-extension bug, HeatMap.cs:38-62 vs :148). */
  def tiles(res: Int = 512, schema: Option[StructType] = None): Option[DataFrame] =
    read("global", schema).map { g =>
      import org.apache.spark.sql.functions._
      g.select(col("z"), floor(col("gx") / res).cast("long").as("tx"),
        floor(col("gy") / res).cast("long").as("ty")).distinct()
    }

  /** Last committed batch cursor (the reference's LastContributionId). */
  def lastCommittedId: Long = committedBatches.map(_._2).foldLeft(-1L)(math.max)

  /** (fromId, toId) windows already committed — resume skips these.
    *
    * A commit record is authoritative only up to HEAD: the record is
    * appended BEFORE HEAD moves, so a crash in between leaves a dangling
    * record whose version exceeds `currentVersion`. Filtering on
    * `version <= currentVersion` makes that batch eligible for re-run
    * (idempotent: the retry overwrites the dangling v<N+1> snapshot and
    * re-appends; duplicate lines for the same version are harmless since
    * HEAD decides). Without the filter the batch would be skipped forever —
    * silent data loss behind an "exactly-once" facade. */
  def committedBatches: Seq[(Long, Long)] =
    if (!Files.exists(commitsFile)) Seq.empty
    else {
      val head = currentVersion
      val Version = """"version":\s*(\d+)""".r.unanchored
      val From = """"from_id":\s*(-?\d+)""".r.unanchored
      val To = """"to_id":\s*(-?\d+)""".r.unanchored
      scala.jdk.CollectionConverters.ListHasAsScala(Files.readAllLines(commitsFile)).asScala.toSeq
        .flatMap { line =>
          (line, line, line) match {
            case (Version(v), From(f), To(t)) if v.toLong <= head => Some((f.toLong, t.toLong))
            case _ => None
          }
        }
    }

  private def dirBytes(path: String): Long = {
    val d = Paths.get(path)
    if (!Files.exists(d)) 0L
    else {
      val s = Files.walk(d)
      try s.filter(Files.isRegularFile(_)).mapToLong(Files.size).sum
      finally s.close()
    }
  }

  /** Write-time stats from parquet FOOTERS (driver-side metadata reads, no
    * Spark job, no data scan — the Iceberg-manifest analog): total rows +
    * rows per partition-directory value. Replaces the old post-write
    * `read.count()` + `groupBy(c).count()` re-scan, which doubled commit
    * latency with two extra jobs per relation. */
  private def footerStats(path: String, partitioned: Boolean): (Long, Map[String, Long]) = {
    val conf = spark.sessionState.newHadoopConf()
    val d = Paths.get(path)
    if (!Files.exists(d)) return (0L, Map.empty)
    val s = Files.walk(d)
    val files =
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala
          .filter(p => Files.isRegularFile(p) && p.getFileName.toString.endsWith(".parquet"))
          .toList
      } finally s.close()
    var total = 0L
    val perPart = scala.collection.mutable.Map.empty[String, Long]
    files.foreach { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f.toUri), conf)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      val n = try reader.getRecordCount finally reader.close()
      total += n
      if (partitioned) {
        // hive-style dir name "<col>=<value>" directly under the snapshot root
        val rel = d.relativize(f)
        if (rel.getNameCount > 1) {
          val seg = rel.getName(0).toString
          val v = seg.indexOf('=') match { case -1 => seg; case i => seg.substring(i + 1) }
          perPart.updateWith(v) { c => Some(c.getOrElse(0L) + n) }
        }
      }
    }
    (total, perPart.toMap)
  }

  /**
   * Write the given relations as version N+1 and commit atomically:
   * parquet first, then the commit record, then HEAD (rename). Metrics
   * capture row counts per relation and per partition column value
   * (lineage), plus byte sizes.
   */
  def commit(batchFrom: Long, batchTo: Long,
             relations: Map[String, (DataFrame, Option[String])]): Long = {
    val next = currentVersion + 1
    val metrics = relations.map { case (name, (df, partitionBy)) =>
      val path = rootPath.resolve(name).resolve(s"v$next").toString
      val writer = df.write.mode("overwrite")
      partitionBy.fold(writer)(c => writer.partitionBy(c)).parquet(path)
      val (rows, partRows) = footerStats(path, partitionBy.isDefined)
      val perPartition =
        if (partitionBy.isEmpty) "{}"
        else partRows.map { case (v, n) => s""""$v": $n""" }.toSeq.sorted.mkString("{", ", ", "}")
      s""""$name": {"rows": $rows, "bytes": ${dirBytes(path)}, "partition_rows": $perPartition}"""
    }
    val record =
      s"""{"version": $next, "from_id": $batchFrom, "to_id": $batchTo, "relations": {${metrics.mkString(", ")}}}"""
    Files.write(commitsFile, (record + "\n").getBytes(StandardCharsets.UTF_8),
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
    val tmp = rootPath.resolve("HEAD.tmp")
    Files.write(tmp, next.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, headFile, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    next
  }
}
