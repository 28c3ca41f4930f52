package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, max, min}

/**
 * Incremental-dedup service loop over the persisted LSH index: build from
 * batch 0, then probe-then-append each later batch — the exact posture a
 * resident training-corpus pipeline runs (and the text-dedup analog of the
 * reference's incremental tile maintenance). Prints per-batch probe time
 * and the growing index size; the SCALE CLAIM this measures is that probe
 * cost tracks the (fixed) batch size, not the (growing) index — the
 * directory prune + bucket semi-join keep the quadratic stage bounded by
 * the batch's bucket footprint.
 *
 * Correctness cross-check on the final state: the SET of all probed pairs
 * plus batch 0's internal pairs must equal batch-mode `minhashNearDups`
 * over the full corpus exactly (every pair surfaces exactly once — when
 * its later document's batch arrives). Both sides run UNCAPPED
 * (maxBucket = Int.MaxValue): the incremental cap is taken over the
 * corpus-so-far, so a bucket crossing the cap mid-stream would make the
 * two computations legitimately differ — cap semantics have their own
 * oracle (q_d3/q_d8, DedupJobsSpec); this tool isolates the loop
 * identity.
 *
 * Preconditions (checked loudly): dense doc_ids 0..n-1 (batching is by id
 * range) and a corpus spanning at least two batches.
 */
object LshLoopProbe {
  def main(args: Array[String]): Unit = {
    implicit val spark: SparkSession = graft.spark.Sessions.local(32, "lsh-loop")
    import spark.implicits._
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val batchSize = if (args.nonEmpty) args(0).toLong else 500L
    val compactEvery = if (args.length > 1) args(1).toInt else 0 // 0 = never
    val docs = graft.queries.Tables.documents(spark, sfDir).select("doc_id", "text").persist()
    val n = docs.count()
    val (minId, maxId) = docs.agg(min("doc_id"), max("doc_id")).as[(Long, Long)].head()
    require(minId == 0L && maxId == n - 1,
      s"LshLoopProbe batches by id range and needs dense doc_ids 0..${n - 1}; got [$minId, $maxId]")
    val nBatches = ((n + batchSize - 1) / batchSize).toInt
    require(nBatches >= 2, s"corpus ($n docs) must span >= 2 batches of $batchSize")
    val noCap = Int.MaxValue
    val dir = java.nio.file.Files.createTempDirectory("lsh-loop").toString
    try {
      val t0 = System.nanoTime()
      graft.dedup.LshIndex.build(docs.where(col("doc_id") < batchSize), dir, bands = 8)
      println(f"[lsh-loop] build batch=0 docs=$batchSize sec=${(System.nanoTime() - t0) / 1e9}%.2f")
      def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
        df.select("a", "b").as[(Long, Long)].collect().toSet
      // STANDING clustering, maintained per batch by incrementalClusters —
      // the full service loop is index → probe → fold pairs into clusters;
      // per-batch fold cost must track the batch (rep-graph CC + one remap
      // join), not the corpus, and the final labels must equal batch-mode
      // CC over the whole corpus exactly.
      val inBatch0 = pairSet(graft.dedup.Dedup.minhashNearDups(
        docs.where(col("doc_id") < batchSize), threshold = 0.8, bands = 8, maxBucket = noCap))
      // freshLocalCheckpoint: per-batch labels re-checkpoint in a LOOP —
      // inherited stats would compound geometrically across batches (see
      // SparkInternals). CC's own output is already checkpoint-backed.
      val freshCp = org.apache.spark.sql.graft.SparkInternals.freshLocalCheckpoint _
      var labels = graft.dedup.Dedup.connectedComponents(
          spark.createDataset(inBatch0.toSeq).toDF("a", "b"),
          docs.where(col("doc_id") < batchSize).select("doc_id"))
      val probed = scala.collection.mutable.Set.empty[(Long, Long)]
      val secs = (1 until nBatches).map { b =>
        val batch = docs.where(col("doc_id") >= b * batchSize && col("doc_id") < (b + 1) * batchSize)
        val tp = System.nanoTime()
        val pairs = graft.dedup.LshIndex.probe(dir, batch, threshold = 0.8, bands = 8,
            maxBucket = noCap)
          .select("a", "b").as[(Long, Long)].collect()
        val probeSec = (System.nanoTime() - tp) / 1e9
        val ta = System.nanoTime()
        graft.dedup.LshIndex.append(batch, dir, bands = 8)
        val appendSec = (System.nanoTime() - ta) / 1e9
        // fold the batch into the standing clustering (checkpointed per
        // batch so lineage stays flat; superseded blocks — the previous
        // labels AND the fold's internal remap checkpoint — released
        // eagerly once the fresh checkpoint has materialized)
        val tc0 = System.nanoTime()
        val inner = graft.dedup.Dedup.incrementalClusters(labels,
            spark.createDataset(pairs.toSeq).toDF("a", "b"),
            batch.select("doc_id"))
        val next = freshCp(inner)
        val foldSec = (System.nanoTime() - tc0) / 1e9
        graft.dedup.Dedup.releaseCheckpoint(inner) // remap + superseded labels
        labels = next
        probed ++= pairs
        println(f"[lsh-loop] batch=$b indexed=${b * batchSize} probe_sec=$probeSec%.2f " +
          f"append_sec=$appendSec%.2f fold_sec=$foldSec%.2f pairs=${pairs.length}")
        if (compactEvery > 0 && b % compactEvery == 0) {
          val tc = System.nanoTime()
          graft.dedup.LshIndex.compact(dir)
          println(f"[lsh-loop] compact after batch=$b sec=${(System.nanoTime() - tc) / 1e9}%.2f")
        }
        (probeSec, foldSec)
      }
      val probeSecs = secs.map(_._1); val foldSecs = secs.map(_._2)
      // exact SET identity (counts alone could mask compensating errors)
      val batchMode = pairSet(
        graft.dedup.Dedup.minhashNearDups(docs, threshold = 0.8, bands = 8, maxBucket = noCap))
      val union = probed.toSet ++ inBatch0
      val ok = union == batchMode && probed.toSet.intersect(inBatch0).isEmpty
      println(s"[lsh-loop] probes=${probed.size} batch0_internal=${inBatch0.size} " +
        s"batch_mode=${batchMode.size} set_match=$ok" +
        (if (ok) "" else s" missing=${(batchMode -- union).take(3)} extra=${(union -- batchMode).take(3)}"))
      // incremental standing clustering == batch-mode CC over the corpus
      val incrFinal = labels.as[(Long, Long)].collect().toMap
      val ccBatch = graft.dedup.Dedup.connectedComponents(
          spark.createDataset(batchMode.toSeq).toDF("a", "b"), docs.select("doc_id"))
        .as[(Long, Long)].collect().toMap
      val okCc = incrFinal == ccBatch
      println(s"[lsh-loop] clusters incremental=${incrFinal.values.toSet.size} " +
        s"batch_mode=${ccBatch.values.toSet.size} label_match=$okCc")
      println(f"[lsh-loop] probe_sec first=${probeSecs.head}%.2f last=${probeSecs.last}%.2f " +
        f"ratio=${probeSecs.last / probeSecs.head}%.2f (flat ratio = probe cost tracks batch, not index)")
      println(f"[lsh-loop] fold_sec first=${foldSecs.head}%.2f last=${foldSecs.last}%.2f " +
        f"ratio=${foldSecs.last / foldSecs.head}%.2f (flat ratio = cluster fold tracks batch, not corpus)")
      if (!ok) throw new IllegalStateException("probe-union pair set != batch mode")
      if (!okCc) throw new IllegalStateException("incremental clustering != batch-mode CC")
    } finally {
      graft.stream.StreamDedup.deleteTree(dir)
      spark.stop()
    }
  }
}
