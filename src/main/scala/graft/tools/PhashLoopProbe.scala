package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/**
 * IMAGE-side incremental dedup service loop — the pHash analog of
 * `LshLoopProbe`, completing the per-modality story: build the persisted
 * block index from batch 0, then probe-then-append each arriving batch
 * and fold its pairs into a STANDING clustering (`incrementalClusters`).
 * Batches interleave the planted near-dup groups (assignment by
 * id % nBatches), so most pairs surface CROSS-batch — one endpoint
 * already indexed, the other arriving — the regime the index exists for.
 *
 * Scale claims measured: probe cost tracks the (fixed) batch, not the
 * (growing) index; fold cost tracks the batch + touched clusters, not
 * the corpus. Correctness closed exactly: the union of all probed pair
 * sets plus batch 0's internal pairs equals uncapped batch-mode
 * `phashNearDups` over the full corpus (disjointly — every pair surfaces
 * exactly once, when its later endpoint arrives), and the final standing
 * labels equal batch-mode `phashClusters` as a Map identity.
 *
 * Usage: sbt 'runMain graft.tools.PhashLoopProbe [nImages] [nBatches] [compactEvery]'
 */
object PhashLoopProbe {
  def main(args: Array[String]): Unit = {
    implicit val spark: SparkSession = graft.spark.Sessions.local(32, "phash-loop")
    import spark.implicits._
    val n = if (args.nonEmpty) args(0).toLong else 4096L
    val nBatches = if (args.length > 1) args(1).toInt else 8
    val compactEvery = if (args.length > 2) args(2).toInt else 0 // 0 = never
    require(nBatches >= 2, "need >= 2 batches")
    val noCap = Int.MaxValue
    val imgs = spark.range(n).as[Long]
      .map(i => (i, graft.synth.ImageSynth.plantedPhash(i))).toDF("id", "phash")
      .persist()
    def batchOf(b: Int) = imgs.where(col("id") % nBatches === b)
    val dir = java.nio.file.Files.createTempDirectory("phash-loop").toString
    try {
      val t0 = System.nanoTime()
      graft.dedup.PhashIndex.build(batchOf(0), dir, maxDist = 3)
      println(f"[phash-loop] build batch=0 imgs=${n / nBatches} sec=${(System.nanoTime() - t0) / 1e9}%.2f")
      def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
        df.select("a", "b").as[(Long, Long)].collect().toSet
      val inBatch0 = pairSet(
        graft.dedup.Dedup.phashNearDups(batchOf(0), maxDist = 3, maxBucket = noCap))
      // CC's own output is already checkpoint-backed; freshCp only wraps
      // the per-batch folds (whose plans would otherwise accumulate)
      val freshCp = org.apache.spark.sql.graft.SparkInternals.freshLocalCheckpoint _
      var labels = graft.dedup.Dedup.connectedComponents(
        spark.createDataset(inBatch0.toSeq).toDF("a", "b"), batchOf(0).select("id"))
      val probed = scala.collection.mutable.Set.empty[(Long, Long)]
      val secs = (1 until nBatches).map { b =>
        val batch = batchOf(b)
        val tp = System.nanoTime()
        val pairs = graft.dedup.PhashIndex.probe(dir, batch, maxDist = 3, maxBucket = noCap)
          .select("a", "b").as[(Long, Long)].collect()
        val probeSec = (System.nanoTime() - tp) / 1e9
        val ta = System.nanoTime()
        graft.dedup.PhashIndex.append(batch, dir, maxDist = 3)
        val appendSec = (System.nanoTime() - ta) / 1e9
        val tc0 = System.nanoTime()
        val inner = graft.dedup.Dedup.incrementalClusters(labels,
          spark.createDataset(pairs.toSeq).toDF("a", "b"), batch.select("id"))
        val next = freshCp(inner)
        val foldSec = (System.nanoTime() - tc0) / 1e9
        graft.dedup.Dedup.releaseCheckpoint(inner) // remap + superseded labels
        labels = next
        probed ++= pairs
        println(f"[phash-loop] batch=$b indexed=${b * n / nBatches} probe_sec=$probeSec%.2f " +
          f"append_sec=$appendSec%.2f fold_sec=$foldSec%.2f pairs=${pairs.length}")
        if (compactEvery > 0 && b % compactEvery == 0) {
          val tc = System.nanoTime()
          graft.dedup.PhashIndex.compact(dir)
          println(f"[phash-loop] compact after batch=$b sec=${(System.nanoTime() - tc) / 1e9}%.2f")
        }
        (probeSec, foldSec)
      }
      val probeSecs = secs.map(_._1); val foldSecs = secs.map(_._2)
      // exact SET identity vs uncapped batch mode (counts could mask
      // compensating errors); disjointness proves single surfacing
      val batchMode = pairSet(
        graft.dedup.Dedup.phashNearDups(imgs, maxDist = 3, maxBucket = noCap))
      val union = probed.toSet ++ inBatch0
      val ok = union == batchMode && probed.toSet.intersect(inBatch0).isEmpty
      println(s"[phash-loop] probes=${probed.size} batch0_internal=${inBatch0.size} " +
        s"batch_mode=${batchMode.size} set_match=$ok" +
        (if (ok) "" else s" missing=${(batchMode -- union).take(3)} extra=${(union -- batchMode).take(3)}"))
      val incrFinal = labels.as[(Long, Long)].collect().toMap
      val ccBatch = graft.dedup.Dedup.phashClusters(imgs, maxDist = 3, maxBucket = noCap)
        .as[(Long, Long)].collect().toMap
      val okCc = incrFinal == ccBatch
      println(s"[phash-loop] clusters incremental=${incrFinal.values.toSet.size} " +
        s"batch_mode=${ccBatch.values.toSet.size} label_match=$okCc")
      println(f"[phash-loop] probe_sec first=${probeSecs.head}%.2f last=${probeSecs.last}%.2f " +
        f"ratio=${probeSecs.last / probeSecs.head}%.2f (flat ratio = probe cost tracks batch, not index)")
      println(f"[phash-loop] fold_sec first=${foldSecs.head}%.2f last=${foldSecs.last}%.2f " +
        f"ratio=${foldSecs.last / foldSecs.head}%.2f (flat ratio = cluster fold tracks batch, not corpus)")
      if (!ok) throw new IllegalStateException("probe-union pair set != batch mode")
      if (!okCc) throw new IllegalStateException("incremental clustering != batch-mode phashClusters")
    } finally {
      graft.stream.StreamDedup.deleteTree(dir)
      spark.stop()
    }
  }
}
