package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * PERSISTED, INCREMENTALLY-MAINTAINED MinHash-LSH index — the
 * index-once / probe-many posture for text dedup, mirroring the IVF
 * treatment of ANN (`Ann.buildIvfIndex` / `ivfTopKIndexed`) and the
 * reference's incremental-maintenance philosophy (heatmap-tiles
 * `Worker.cs:50-61` maintains its tile store incrementally per batch; this
 * is the same posture applied to the dedup index). At 100 TB the banded
 * index is exactly the thing you materialize once and append to as new
 * documents arrive — recomputing MinHash over the whole corpus per batch
 * (what `minhashNearDups` does) is the non-starter.
 *
 * Layout under `dir`:
 *   bands/    (doc_id, band, bucket) hive-partitioned by `bpb` — the
 *             (band, bucket-prefix) directory key, so a probe's scan is
 *             PRUNED to the directories its batch's buckets can live in
 *             (plan-asserted in LshIndexSpec, like AnnSpec's
 *             PartitionFilters assert).
 *   shingles/ (doc_id, sh: sorted shingle-hash array) — the refine-side
 *             payload, so the exact-Jaccard verify never re-reads corpus
 *             text.
 *
 * Probe contract (LshIndexSpec + the q_d8 oracle): probe BEFORE appending
 * the batch — `probe(dir, batch)` returns exactly the batch-mode
 * `minhashNearDups(indexed ∪ batch)` pairs RESTRICTED to pairs touching
 * the batch (both batch-batch and batch-index pairs), including identical
 * BucketCap semantics: bucket sizes are counted over index ∪ batch
 * membership, which equals the batch-mode count because a bucket's rows
 * all share one `bpb` partition — the pruned scan reads every index row of
 * every bucket the batch can touch.
 */
object LshIndex {

  /** Bucket-prefix fan-out per band. bpb = band * PrefixBuckets + prefix:
    * one partition column encodes both levels, so `bpb IN (...)` prunes
    * directories in a single filter. 8 bands × 16 prefixes = 128 dirs. */
  val PrefixBuckets = 16

  def bpbCol(band: org.apache.spark.sql.Column, bucket: org.apache.spark.sql.Column) =
    (band * PrefixBuckets + pmod(bucket, lit(PrefixBuckets.toLong)).cast("int")).as("bpb")

  /** (doc_id, band, bucket, bpb) band rows for a document set. */
  private def bandRows(docs: DataFrame, numHashes: Int, bands: Int)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    Dedup.shingleSigs(docs, numHashes)
      .flatMap { case (id, _, sig) =>
        Dedup.lshBands(sig, bands).zipWithIndex.map { case (h, b) => (id, b, h) }
      }
      .toDF("doc_id", "band", "bucket")
      .withColumn("bpb", bpbCol(col("band"), col("bucket")))
  }

  private def shingleRows(docs: DataFrame, numHashes: Int)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    Dedup.shingleSigs(docs, numHashes).map { case (id, sh, _) => (id, sh) }
      .toDF("doc_id", "sh")
  }

  /** The bpb directory footprint of a batch — the same computation
    * `probe` prunes its index scan with (exposed for the plan-pruning
    * spec and for capacity diagnostics; bounded by bands × PrefixBuckets). */
  def probeTouchedBpbs(batch: DataFrame, numHashes: Int = 64, bands: Int = 16)(
      implicit spark: SparkSession): Seq[Int] = {
    import spark.implicits._
    bandRows(batch, numHashes, bands).select("bpb").distinct().as[Int].collect().toSeq
  }

  /** Build the index over `docs` (overwrites `dir`). */
  def build(docs: DataFrame, dir: String, numHashes: Int = 64, bands: Int = 16)(
      implicit spark: SparkSession): Unit = {
    bandRows(docs, numHashes, bands)
      .repartition(col("bpb"))
      .write.mode("overwrite").partitionBy("bpb").parquet(s"$dir/bands")
    shingleRows(docs, numHashes)
      .write.mode("overwrite").parquet(s"$dir/shingles")
  }

  /** Append a new batch to an existing index. The caller is responsible
    * for having probed first if pairs against this batch are wanted (an
    * appended document is indistinguishable from a built one afterwards —
    * probing a batch already appended would double-count its band rows). */
  def append(docs: DataFrame, dir: String, numHashes: Int = 64, bands: Int = 16)(
      implicit spark: SparkSession): Unit = {
    bandRows(docs, numHashes, bands)
      .repartition(col("bpb"))
      .write.mode("append").partitionBy("bpb").parquet(s"$dir/bands")
    shingleRows(docs, numHashes)
      .write.mode("append").parquet(s"$dir/shingles")
  }

  /** Near-dup pairs of `batch` against the index AND within the batch —
    * `minhashNearDups(indexed ∪ batch)` restricted to pairs touching the
    * batch, without recomputing anything over the indexed corpus: the
    * index side contributes only a DIRECTORY-PRUNED scan of the bucket
    * partitions the batch can touch plus a semi-joined shingle lookup for
    * the verify step. */
  def probe(dir: String, batch: DataFrame, threshold: Double = 0.7,
            numHashes: Int = 64, bands: Int = 16, maxBucket: Int = 256,
            capObs: Option[org.apache.spark.sql.Observation] = None)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val newBands = bandRows(batch, numHashes, bands).withColumn("is_new", lit(true))
      .persist()
    // the batch's bpb footprint — bounded by bands × PrefixBuckets (128),
    // a legitimate driver-side collect regardless of batch size
    val touched = newBands.select("bpb").distinct().as[Int].collect().toSeq
    // partition-pruned index scan: only directories the batch can pair in
    val idxBands = spark.read.parquet(s"$dir/bands")
      .where(col("bpb").isin(touched.map(Integer.valueOf): _*))
      .select(col("doc_id"), col("band"), col("bucket"), lit(false).as("is_new"))
    val combined = idxBands.unionByName(newBands.select("doc_id", "band", "bucket", "is_new"))
    // cap over index ∪ batch membership == batch-mode cap (see scaladoc)
    val capped = graft.spark.BucketCap.cap(combined, Seq("band", "bucket"), maxBucket, capObs)
    val cand = capped.as("l").join(capped.as("r"),
        $"l.band" === $"r.band" && $"l.bucket" === $"r.bucket" && $"l.doc_id" < $"r.doc_id")
      .where($"l.is_new" || $"r.is_new")
      .select($"l.doc_id".as("a"), $"r.doc_id".as("b")).distinct()
    // refine shingles: index payload for old ids (semi-join), fresh for new
    val candIds = cand.select(col("a").as("doc_id"))
      .union(cand.select(col("b").as("doc_id"))).distinct()
    val idxSh = spark.read.parquet(s"$dir/shingles")
      .join(candIds, "doc_id")
    val sh = idxSh.unionByName(shingleRows(batch, numHashes))
      .as[(Long, Array[Long])].toDF("doc_id", "sh")
    val out = cand
      .join(sh.withColumnRenamed("doc_id", "a").withColumnRenamed("sh", "sha"), "a")
      .join(sh.withColumnRenamed("doc_id", "b").withColumnRenamed("sh", "shb"), "b")
      .as[(Long, Long, Array[Long], Array[Long])]
      .map { case (b, a, sha, shb) => (a, b, Dedup.jaccardSorted(sha, shb)) }
      .toDF("a", "b", "jaccard")
      .where($"jaccard" >= threshold)
      .select(least($"a", $"b").as("a"), greatest($"a", $"b").as("b"), $"jaccard")
      .localCheckpoint(true) // self-owned cache lifetime, as minhashNearDups
    newBands.unpersist()
    out
  }
}
