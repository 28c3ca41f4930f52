package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * PERSISTED, INCREMENTALLY-APPENDABLE perceptual-hash index — the image
 * modality's index-once / probe-many path, completing the symmetry:
 * `LshIndex` persists the text MinHash bands, `StreamDedup` handles
 * arrival-time dedup, and this serves the remaining service shape —
 * re-probing each new image batch against a large HISTORICAL corpus
 * without recomputing anything over it.
 *
 * Layout under `dir`:
 *   blocks/   (id, phash, blk, bval) hive-partitioned by `bpb` — the
 *             (block, value-prefix) directory key; a probe prunes to the
 *             directories its batch's block values can live in.
 *   MAXDIST   the hamming radius the block layout was built for
 *             (maxDist + 1 blocks — pigeonhole recall 1 holds only at
 *             the build radius, so probe REQUIRES an equal radius).
 *
 * Probe contract (mirrors `LshIndex.probe`, spec'd in PhashIndexSpec):
 * probe BEFORE appending the batch — `probe(dir, batch)` returns exactly
 * `Dedup.phashNearDups(indexed ∪ batch)` restricted to pairs touching the
 * batch, including identical BucketCap semantics (bucket membership of
 * every touched (blk, bval) is complete in the pruned scan, because a
 * bucket's rows all share one `bpb` directory).
 */
object PhashIndex {

  /** Value-prefix fan-out per block: bpb = blk * PrefixBuckets + prefix. */
  val PrefixBuckets = 16

  private def bpbCol(blk: org.apache.spark.sql.Column, bval: org.apache.spark.sql.Column) =
    (blk * PrefixBuckets + pmod(bval, lit(PrefixBuckets.toLong)).cast("int")).as("bpb")

  private def blockRows(imgs: DataFrame, maxDist: Int)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val nBlocks = maxDist + 1
    imgs.select("id", "phash").as[(Long, Long)]
      .flatMap { case (id, ph) =>
        Dedup.phashBlocks(ph, nBlocks).map { case (b, v) => (id, ph, b, v) }
      }
      .toDF("id", "phash", "blk", "bval")
      .withColumn("bpb", bpbCol(col("blk"), col("bval")))
  }

  private def maxDistFile(dir: String) = java.nio.file.Paths.get(dir, "MAXDIST")

  private def checkRadius(dir: String, maxDist: Int): Unit = {
    require(java.nio.file.Files.exists(maxDistFile(dir)),
      s"no complete phash index at $dir (MAXDIST missing — build writes it last, " +
        "so a crashed build reads as absent, not as a usable index)")
    val stored = new String(java.nio.file.Files.readAllBytes(maxDistFile(dir)), "UTF-8").trim.toInt
    require(stored == maxDist,
      s"index at $dir was built for maxDist=$stored; probe/append at $maxDist would break " +
        "the pigeonhole recall guarantee — rebuild or match the radius")
  }

  def build(imgs: DataFrame, dir: String, maxDist: Int = 3)(
      implicit spark: SparkSession): Unit = {
    require(maxDist >= 0 && maxDist <= 15, s"maxDist $maxDist outside [0, 15]")
    blockRows(imgs, maxDist)
      .repartition(col("bpb"))
      .write.mode("overwrite").partitionBy("bpb").parquet(s"$dir/blocks")
    java.nio.file.Files.write(maxDistFile(dir), maxDist.toString.getBytes("UTF-8"))
  }

  /** Append a batch (probe first if its pairs are wanted — same contract
    * as `LshIndex.append`). */
  def append(imgs: DataFrame, dir: String, maxDist: Int = 3)(
      implicit spark: SparkSession): Unit = {
    checkRadius(dir, maxDist)
    blockRows(imgs, maxDist)
      .repartition(col("bpb"))
      .write.mode("append").partitionBy("bpb").parquet(s"$dir/blocks")
  }

  /** Compact the block table: one file per bpb partition (append adds one
    * file per touched directory per batch — same fragmentation, same fix
    * as `LshIndex.compact`; crash-safe via `IndexFiles.compactDir`). */
  def compact(dir: String)(implicit spark: SparkSession): Unit =
    IndexFiles.compactDir(dir, "blocks", partitioned = true)

  /** Exact hamming pairs (a, b, dist) of `batch` vs the index AND within
    * the batch — `phashNearDups(indexed ∪ batch)` restricted to pairs
    * touching the batch. The index contributes a directory-pruned,
    * bucket-semi-joined scan only. */
  def probe(dir: String, batch: DataFrame, maxDist: Int = 3, maxBucket: Int = 4096,
            capObs: Option[org.apache.spark.sql.Observation] = None)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    IndexFiles.recover(dir, "blocks") // crashed-compaction rollback
    checkRadius(dir, maxDist)
    val newBlocks = blockRows(batch, maxDist).withColumn("is_new", lit(true)).persist()
    val touched = newBlocks.select("bpb").distinct().as[Int].collect().toSeq
    val idx = spark.read.parquet(s"$dir/blocks")
      .where(col("bpb").isin(touched.map(Integer.valueOf): _*))
      .select(col("id"), col("phash"), col("blk"), col("bval"), lit(false).as("is_new"))
    val combined = idx.unionByName(newBlocks.select("id", "phash", "blk", "bval", "is_new"))
    // exact-bucket restriction (the directory prune is 16-way coarse);
    // broadcast: a probe batch is small by definition
    val newKeys = broadcast(newBlocks.select("blk", "bval").distinct())
    val relevant = combined.join(newKeys, Seq("blk", "bval"), "left_semi")
    // persisted across the self-join's two sides + the cap's sizes join —
    // without it the pruned-scan + semi-join subtree evaluates up to 4×
    // per probe (same fix as LshIndex.probe)
    val capped = graft.spark.BucketCap.cap(relevant, Seq("blk", "bval"), maxBucket, capObs)
      .persist()
    val out = capped.as("l").join(capped.as("r"),
        $"l.blk" === $"r.blk" && $"l.bval" === $"r.bval" && $"l.id" < $"r.id")
      .where($"l.is_new" || $"r.is_new")
      .select($"l.id".as("a"), $"r.id".as("b"), $"l.phash".as("pa"), $"r.phash".as("pb"))
      .distinct() // a pair can collide on several blocks
      .withColumn("dist", bit_count($"pa".bitwiseXOR($"pb")).cast("long"))
      .where($"dist" <= maxDist)
      .select($"a", $"b", $"dist")
      .localCheckpoint(true)
    capped.unpersist()
    newBlocks.unpersist()
    out
  }
}
