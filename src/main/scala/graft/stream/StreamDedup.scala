package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

import graft.dedup.Dedup

/**
 * Streaming image near-deduplication — the crawl-ingest shape of a
 * training-data pipeline: as image rows arrive, mark each one a near-dup
 * iff its 64-bit perceptual hash lies within hamming `maxDist` of ANY
 * image seen before it (earlier micro-batch, or earlier id in the same
 * batch).
 *
 * Distribution reuses the batch operator's pigeonhole index
 * (`Dedup.phashBlocks`): an image explodes into `maxDist + 1` (block,
 * value) keys, and any pair within `maxDist` shares at least one whole
 * block — so per-bucket state (the phashes seen in that bucket) is
 * sufficient for EXACT detection: the shared bucket is guaranteed to
 * witness the pair. Each bucket's `flatMapGroupsWithState` group compares
 * its batch arrivals (sorted by id) against bucket state + earlier
 * in-batch arrivals and emits one (id, matched-here) row per block; the
 * per-image verdict is the OR over its `maxDist + 1` rows (`collapse`).
 *
 * Convergence contract (same as `Sessionize`): micro-batch slicing must
 * respect id order across batches (a file/kafka source replaying an
 * append log does). Under that contract the stream converges exactly to
 * the batch oracle: an image is a near-dup iff it appears as the HIGHER
 * id of some `Dedup.phashNearDups` pair (StreamDedupSpec proves equality
 * over multi-batch slicings).
 *
 * State size: each admitted phash is stored once per block — `maxDist+1`
 * longs per image, bounded per bucket by `maxBucketState`: a degenerate
 * bucket (e.g. flat images collapsing onto one phash) stops GROWING once
 * full — arrivals still match against the retained members (a saturated
 * bucket keeps catching what it already holds; by pigeonhole a pair can
 * only be missed if ALL its shared buckets overflowed their cap with
 * non-witnessing members), and the overflow is observable via the
 * emitted `bucket_full` flag, never silent.
 */
object StreamDedup {
  final case class ImageIn(id: Long, phash: Long)
  final case class BlockProbe(blk: Int, bval: Long, id: Long, phash: Long)
  final case class BlockVerdict(id: Long, phash: Long, matched: Boolean, bucket_full: Boolean)
  final case class BucketState(phashes: Array[Long])

  val DefaultMaxBucketState = 100000

  /** Per-bucket micro-batch update: arrivals sorted by id, each compared
    * against state + earlier (lower-id) arrivals of the same batch. Every
    * arrival is then retained in state (capped), matched or not — the
    * semantics is "dup of anything SEEN earlier", not "of anything kept":
    * bucket-locally decidable, so no cross-bucket coordination exists. */
  def updateBucket(maxDist: Int, maxBucketState: Int)(
      key: (Int, Long), rows: Iterator[BlockProbe],
      state: GroupState[BucketState]): Iterator[BlockVerdict] = {
    val sorted = rows.toArray.sortBy(_.id)
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    state.getOption.foreach(s => seen ++= s.phashes)
    val out = sorted.map { p =>
      var m = false
      var exact = false
      var i = 0
      while (i < seen.length && !exact) {
        val d = Dedup.hamming(seen(i), p.phash)
        if (d <= maxDist) m = true
        if (d == 0) exact = true
        i += 1
      }
      // state holds DISTINCT phashes only: an exact copy adds no matching
      // power, and a degenerate identical-phash cluster must not burn the
      // cap on copies (it would evict retention for later distinct hashes)
      val full = seen.length >= maxBucketState
      if (!full && !exact) seen += p.phash
      BlockVerdict(p.id, p.phash, m, full)
    }
    state.update(BucketState(seen.toArray))
    out.iterator
  }

  /** Streaming transform: image rows → one verdict row per block key. */
  def nearDupStream(images: DataFrame, maxDist: Int = 3,
                    maxBucketState: Int = DefaultMaxBucketState)(
      implicit spark: SparkSession): Dataset[BlockVerdict] = {
    require(maxDist >= 0 && maxDist <= 15, s"maxDist $maxDist outside [0, 15]")
    import spark.implicits._
    images.select("id", "phash").as[ImageIn]
      .flatMap { im =>
        Dedup.phashBlocks(im.phash, maxDist + 1).map { case (b, v) =>
          BlockProbe(b, v, im.id, im.phash)
        }
      }
      .groupByKey(p => (p.blk, p.bval))
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(
        updateBucket(maxDist, maxBucketState))
  }

  /** Per-image verdicts from the per-block relation: OR over blocks. */
  def collapse(verdicts: DataFrame): DataFrame =
    verdicts.groupBy(col("id"))
      .agg(max(col("phash")).as("phash"),
        max(col("matched")).cast("boolean").as("is_dup"),
        max(col("bucket_full")).cast("boolean").as("any_bucket_full"))

  /** Batch oracle: an image is a near-dup iff some LOWER-id image lies
    * within `maxDist` — i.e. iff it is the `b` side of a
    * `Dedup.phashNearDups` pair (the already-oracled exact batch join). */
  def nearDupBatch(images: DataFrame, maxDist: Int = 3)(
      implicit spark: SparkSession): DataFrame = {
    val dups = Dedup.phashNearDups(images, maxDist)
      .select(col("b").as("id")).distinct().withColumn("is_dup", lit(true))
    images.select("id", "phash").join(dups, Seq("id"), "left_outer")
      .withColumn("is_dup", coalesce(col("is_dup"), lit(false)))
  }

  /** State-store partition count for the bounded drive-to-completion
    * harnesses: each micro-batch commits one state-store delta PER state
    * partition, so a 4-batch toy drive at the session's 32 shuffle
    * partitions pays 128 state commits for a few thousand rows. The
    * harness drives the stream in a cloned session (same SparkContext,
    * own conf) pinned to a narrower state layout — purely an internal
    * physical knob: verdicts are bucket-local, so the state partition
    * count never changes results (StreamDedupSpec equality holds at any
    * width). A real deployment sizes this to its key cardinality instead. */
  val HarnessStatePartitions = 8

  private def driveToCompletion(sourceDir: String,
      schema: org.apache.spark.sql.types.StructType, queryName: String,
      maxDist: Int, mode: String)(implicit spark: SparkSession): DataFrame = {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", HarnessStatePartitions.toString)
    val src = ss.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(sourceDir)
    val stream = mode match {
      case "image" => nearDupStream(src, maxDist)(ss)
      case "text" => textNearDupStream(src, maxDist)(ss)
      case "emb" => embNearDupStream(src, maxDist)(ss)
    }
    // fresh per-run checkpoint on the shuffle scratch volume (tmpfs when
    // available): the state store + offset/commit logs fsync once per
    // micro-batch per state partition, and the default temp location is
    // the disk-backed java.io.tmpdir — a physical placement knob only
    // (fresh dir per run, deleted after termination; results identical).
    // A real deployment points this at its durable checkpoint store.
    val ckpt = graft.spark.Sessions.scratchDir.getOrElse(
      System.getProperty("java.io.tmpdir")) + s"/stream-ckpt-$queryName"
    val q = stream.writeStream
      .format("memory").queryName(queryName)
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Update())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    deleteTree(ckpt)
    collapse(ss.table(queryName))
  }

  /** Drive a file source to completion (AvailableNow) and return the
    * collapsed per-image verdicts. */
  def runOnce(sourceDir: String, schema: org.apache.spark.sql.types.StructType,
              queryName: String, maxDist: Int = 3)(
      implicit spark: SparkSession): DataFrame =
    driveToCompletion(sourceDir, schema, queryName, maxDist, mode = "image")

  /** Streaming TEXT near-dedup: document rows → 64-bit SimHash (inside
    * the stream) → the SAME pigeonhole block state machine as the image
    * path (hamming ≤ maxDist vs any earlier document). One exact state
    * kernel, two modalities — the batch counterpart is the q_d4 SimHash
    * family (block equality IS the standard hamming≤3 candidate filter,
    * and the verify inside `updateBucket` makes the verdict exact over
    * retained state). Same id-ordered arrival contract as `runOnce`. */
  def textNearDupStream(docs: DataFrame, maxDist: Int = 3,
                        maxBucketState: Int = DefaultMaxBucketState)(
      implicit spark: SparkSession): Dataset[BlockVerdict] = {
    import spark.implicits._
    val hashed = docs.select("id", "text").as[(Long, String)]
      .map { case (id, t) => (id, Dedup.simhash64(t)) }.toDF("id", "phash")
    nearDupStream(hashed, maxDist, maxBucketState)
  }

  /** Drive a (id, text) file source to completion and return collapsed
    * per-document verdicts (id, simhash, is_dup, any_bucket_full). */
  def runOnceText(sourceDir: String, schema: org.apache.spark.sql.types.StructType,
                  queryName: String, maxDist: Int = 3)(
      implicit spark: SparkSession): DataFrame =
    driveToCompletion(sourceDir, schema, queryName, maxDist, mode = "text")
      .withColumnRenamed("phash", "simhash")

  /** Planes for the streaming embedding signature: a 64-bit sign-random-
    * projection is the embedding's SimHash — hamming between signatures is
    * ∝ the angle between the vectors (64 × θ/π in expectation), so the
    * pigeonhole block state machine detects semantic near-dups exactly at
    * the signature level. */
  val EmbSigPlanes = 64

  /** Streaming EMBEDDING near-dedup — the third modality of the one block-
    * state kernel (image pHash, text SimHash, and here the embedding's
    * sign-bit LSH signature, `Ann.lshBucket` at 64 planes, computed INSIDE
    * the stream): a vector is a near-dup iff its signature lies within
    * hamming `maxDist` of any earlier arrival's. Input (id, embedding:
    * Array[Float]); same id-ordered arrival contract as `runOnce`. */
  def embNearDupStream(vecs: DataFrame, maxDist: Int = 3,
                       maxBucketState: Int = DefaultMaxBucketState)(
      implicit spark: SparkSession): Dataset[BlockVerdict] = {
    import spark.implicits._
    val hashed = vecs.select("id", "embedding").as[(Long, Array[Float])]
      .map { case (id, v) => (id, graft.ann.Ann.lshBucket(v, EmbSigPlanes)) }
      .toDF("id", "phash")
    nearDupStream(hashed, maxDist, maxBucketState)
  }

  /** Drive a (id, embedding) file source to completion and return collapsed
    * per-vector verdicts (id, esig, is_dup, any_bucket_full). */
  def runOnceEmb(sourceDir: String, schema: org.apache.spark.sql.types.StructType,
                 queryName: String, maxDist: Int = 3)(
      implicit spark: SparkSession): DataFrame =
    driveToCompletion(sourceDir, schema, queryName, maxDist, mode = "emb")
      .withColumnRenamed("phash", "esig")

  /** Micro-batch harness shared by the spec and the catalog query: write
    * `df` as `nSlices` id-ranged parquet files under a fresh `base`
    * (copy order = id order, satisfying the arrival contract) and return
    * (flatDir, base). Callers delete `base` via `deleteTree` once the
    * stream has terminated — the memory sink owns the results by then. */
  def writeIdOrderedSlices(df: DataFrame, nSlices: Int, sliceSize: Long, base: String): String = {
    import org.apache.spark.sql.functions.col
    val flat = s"$base/flat"
    new java.io.File(flat).mkdirs()
    (0 until nSlices).foreach { i =>
      val dir = s"$base/c$i"
      df.where(col("id") >= i * sliceSize && col("id") < (i + 1) * sliceSize)
        .coalesce(1).write.parquet(dir)
      new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
        .zipWithIndex.foreach { case (f, j) =>
          java.nio.file.Files.copy(f.toPath, java.nio.file.Paths.get(flat, s"p-$i-$j.parquet"))
        }
    }
    flat
  }

  def deleteTree(root: String): Unit = {
    val p = java.nio.file.Paths.get(root)
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      val st = java.nio.file.Files.walk(p)
      try st.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .iterator().asScala.foreach(java.nio.file.Files.delete)
      finally st.close()
    }
  }
}
