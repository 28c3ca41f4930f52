package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * PERSISTED, INCREMENTALLY-APPENDABLE embedding near-dup index — the
 * third leg of the probe triad (text `dedup/LshIndex`, image
 * `dedup/PhashIndex`, embeddings here), so semantic near-dup detection
 * gets the same index-once / probe-many arrival shape: re-probing each
 * new vector batch against a large historical corpus without recomputing
 * anything over it. Candidate generation is the sign-bit random-projection
 * bucket (`Ann.lshBucket` — two vectors collide with probability
 * 1 − θ/π per plane); the verify is the exact codegen'd cosine.
 *
 * Layout under `dir`:
 *   vecs/    (vec_id, bucket, v: double[]) hive-partitioned by `bp` — the
 *            bucket-prefix directory key (pmod(bucket, PrefixBuckets)); a
 *            probe prunes to the directories its batch's buckets can live
 *            in. The double-cast embedding rides as the payload so the
 *            cosine verify never re-reads the corpus table.
 *   PARAMS   "nPlanes PrefixBuckets", written LAST (the LshIndex/MAXDIST
 *            pattern: a mismatched probe computes disjoint buckets and
 *            silently loses recall; a crashed build reads as absent).
 *
 * Probe contract (EmbIndexSpec): probe BEFORE appending the batch —
 * `probe(dir, batch)` returns exactly `Ann.lshNearDupPairs(indexed ∪
 * batch)` restricted to pairs touching the batch, including identical
 * BucketCap semantics (a bucket's rows all share one `bp` directory, so
 * the pruned scan sees full batch-mode bucket membership).
 */
object EmbIndex {

  /** Bucket-prefix fan-out: bp = pmod(bucket, PrefixBuckets). */
  val PrefixBuckets = 32

  private def bpCol(bucket: org.apache.spark.sql.Column) =
    pmod(bucket, lit(PrefixBuckets.toLong)).cast("int").as("bp")

  private def paramsFile(dir: String) = java.nio.file.Paths.get(dir, "PARAMS")

  private def checkParams(dir: String, nPlanes: Int): Unit = {
    require(java.nio.file.Files.exists(paramsFile(dir)),
      s"no complete embedding index at $dir (PARAMS missing — build writes it last, " +
        "so a crashed build reads as absent, not as a usable index)")
    val stored = new String(
      java.nio.file.Files.readAllBytes(paramsFile(dir)), "UTF-8").trim.split("\\s+")
    require(stored.length == 2 && stored(0).toInt == nPlanes &&
        stored(1).toInt == PrefixBuckets,
      s"index at $dir was built with (nPlanes, prefixBuckets) = " +
        s"(${stored.mkString(", ")}); probe/append at ($nPlanes, $PrefixBuckets) " +
        "would compute disjoint bucket keys and silently miss pairs — " +
        "rebuild or match the parameters")
  }

  private def vecRows(emb: DataFrame, nPlanes: Int)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    emb.select("vec_id", "embedding").as[(Long, Array[Float])]
      .map { case (id, v) => (id, Ann.lshBucket(v, nPlanes), v.map(_.toDouble)) }
      .toDF("vec_id", "bucket", "v")
      .withColumn("bp", bpCol(col("bucket")))
  }

  private def write(emb: DataFrame, dir: String, mode: String, nPlanes: Int)(
      implicit spark: SparkSession): Unit =
    vecRows(emb, nPlanes)
      .repartition(col("bp"))
      .write.mode(mode).partitionBy("bp").parquet(s"$dir/vecs")

  /** Build the index over `emb` (overwrites `dir`); PARAMS written last. */
  def build(emb: DataFrame, dir: String, nPlanes: Int = 12)(
      implicit spark: SparkSession): Unit = {
    java.nio.file.Files.deleteIfExists(paramsFile(dir))
    write(emb, dir, "overwrite", nPlanes)
    java.nio.file.Files.write(paramsFile(dir),
      s"$nPlanes $PrefixBuckets".getBytes("UTF-8"))
  }

  /** Append a batch (probe first if its pairs are wanted — the shared
    * contract of all the persisted indexes). */
  def append(emb: DataFrame, dir: String, nPlanes: Int = 12)(
      implicit spark: SparkSession): Unit = {
    checkParams(dir, nPlanes)
    write(emb, dir, "append", nPlanes)
  }

  /** One file per bp partition (append fragmentation maintenance; same
    * crash-safe two-rename as the other indexes). */
  def compact(dir: String)(implicit spark: SparkSession): Unit =
    graft.dedup.IndexFiles.compactDir(dir, "vecs", partitioned = true, partCol = "bp")

  /** Cosine near-dup pairs (a, b, sim) of `batch` vs the index AND within
    * the batch — `Ann.lshNearDupPairs(indexed ∪ batch)` restricted to
    * pairs touching the batch. The index contributes a directory-pruned,
    * bucket-semi-joined scan only; the payload embeddings feed the
    * codegen'd cosine verify directly. */
  def probe(dir: String, batch: DataFrame, threshold: Double = 0.95,
            nPlanes: Int = 12, maxBucket: Int = 256,
            capObs: Option[org.apache.spark.sql.Observation] = None)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    graft.dedup.IndexFiles.recover(dir, "vecs")
    checkParams(dir, nPlanes)
    val newVecs = vecRows(batch, nPlanes).withColumn("is_new", lit(true)).persist()
    // the batch's bp footprint — bounded by PrefixBuckets, a legitimate
    // driver-side collect regardless of batch size
    val touched = newVecs.select("bp").distinct().as[Int].collect().toSeq
    val idx = spark.read.parquet(s"$dir/vecs")
      .where(col("bp").isin(touched.map(Integer.valueOf): _*))
      .select(col("vec_id"), col("bucket"), col("v"), lit(false).as("is_new"))
    val combined = idx.unionByName(newVecs.select("vec_id", "bucket", "v", "is_new"))
    // exact-bucket restriction (the directory prune is PrefixBuckets-way
    // coarse); broadcast: a probe batch is small by definition
    val newKeys = broadcast(newVecs.select("bucket").distinct())
    val relevant = combined.join(newKeys, Seq("bucket"), "left_semi")
    // persisted across the self-join's two sides + the cap's sizes join
    // (same repeated-subtree fix as LshIndex/PhashIndex.probe)
    val capped = graft.spark.BucketCap.cap(relevant, Seq("bucket"), maxBucket, capObs)
      .persist()
    val out = capped.as("l").join(capped.as("r"),
        $"l.bucket" === $"r.bucket" && $"l.vec_id" < $"r.vec_id")
      .where($"l.is_new" || $"r.is_new")
      .select($"l.vec_id".as("a"), $"r.vec_id".as("b"),
        graft.functions.CosineFunctions.cosineSim(spark, $"l.v", $"r.v").as("sim"))
      .where($"sim" >= threshold)
      .localCheckpoint(true)
    capped.unpersist()
    newVecs.unpersist()
    out
  }
}
