package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

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
 * Also cross-checks correctness on the final state: the union of all
 * probe outputs must equal batch-mode minhashNearDups over the full
 * corpus (every pair is "new" exactly once — when its later document's
 * batch is probed).
 */
object LshLoopProbe {
  def main(args: Array[String]): Unit = {
    implicit val spark: SparkSession = graft.spark.Sessions.local(32, "lsh-loop")
    import spark.implicits._
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val batchSize = if (args.nonEmpty) args(0).toLong else 500L
    val docs = graft.queries.Tables.documents(spark, sfDir).select("doc_id", "text").persist()
    val n = docs.count()
    val nBatches = ((n + batchSize - 1) / batchSize).toInt
    val dir = java.nio.file.Files.createTempDirectory("lsh-loop").toString
    val t0 = System.nanoTime()
    graft.dedup.LshIndex.build(docs.where(col("doc_id") < batchSize), dir, bands = 8)
    println(f"[lsh-loop] build batch=0 docs=$batchSize sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    var pairTotal = 0L
    val probeSecs = (1 until nBatches).map { b =>
      val batch = docs.where(col("doc_id") >= b * batchSize && col("doc_id") < (b + 1) * batchSize)
      val tp = System.nanoTime()
      val pairs = graft.dedup.LshIndex.probe(dir, batch, threshold = 0.8, bands = 8).count()
      val probeSec = (System.nanoTime() - tp) / 1e9
      val ta = System.nanoTime()
      graft.dedup.LshIndex.append(batch, dir, bands = 8)
      val appendSec = (System.nanoTime() - ta) / 1e9
      pairTotal += pairs
      println(f"[lsh-loop] batch=$b indexed=${b * batchSize} probe_sec=$probeSec%.2f " +
        f"append_sec=$appendSec%.2f pairs=$pairs")
      probeSec
    }
    // correctness: Σ probe pairs == batch-mode pairs over the full corpus
    val batchMode = graft.dedup.Dedup.minhashNearDups(docs, threshold = 0.8, bands = 8).count()
    val firstBatchPairs = batchMode - pairTotal // pairs wholly inside batch 0, never probed
    val inBatch0 = graft.dedup.Dedup.minhashNearDups(
      docs.where(col("doc_id") < batchSize), threshold = 0.8, bands = 8).count()
    println(f"[lsh-loop] probes_total=$pairTotal batch_mode=$batchMode batch0_internal=$inBatch0 " +
      s"match=${pairTotal + inBatch0 == batchMode}")
    println(f"[lsh-loop] probe_sec first=${probeSecs.head}%.2f last=${probeSecs.last}%.2f " +
      f"ratio=${probeSecs.last / probeSecs.head}%.2f (flat ratio = probe cost tracks batch, not index)")
    graft.stream.StreamDedup.deleteTree(dir)
    spark.stop()
    if (firstBatchPairs != inBatch0)
      throw new IllegalStateException("probe union != batch mode") // loud in scripts
  }
}
