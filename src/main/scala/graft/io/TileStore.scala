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

  /** (fromId, toId) windows already committed — resume skips these. */
  def committedBatches: Seq[(Long, Long)] =
    if (!Files.exists(commitsFile)) Seq.empty
    else {
      val From = """"from_id":\s*(-?\d+)""".r.unanchored
      val To = """"to_id":\s*(-?\d+)""".r.unanchored
      scala.jdk.CollectionConverters.ListHasAsScala(Files.readAllLines(commitsFile)).asScala.toSeq
        .flatMap { line =>
          (line, line) match {
            case (From(f), To(t)) => Some((f.toLong, t.toLong))
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
      val written = spark.read.schema(df.schema).parquet(path)
      val rows = written.count()
      val perPartition = partitionBy.map { c =>
        written.groupBy(c).count().collect()
          .map(r => s""""${r.get(0)}": ${r.getLong(1)}""").sorted.mkString("{", ", ", "}")
      }.getOrElse("{}")
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
