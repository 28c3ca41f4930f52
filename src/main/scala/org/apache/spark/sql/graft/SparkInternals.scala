package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/**
 * Package bridge for ONE `private[sql]` entry point.
 *
 * Why it exists: `Dataset.localCheckpoint(eager = true)` builds its
 * `LogicalRDD` through `LogicalRDD.fromDataset`, which REWRITES the origin
 * plan's statistics into the checkpoint node
 * (spark-sql ExistingRDD.scala, `rewriteStatsAndConstraints`) —
 * unconditionally, with no conf to disable it. For a one-shot checkpoint
 * that is a feature (downstream join planning sees the estimate). For an
 * ITERATED checkpoint→join→checkpoint loop (connected components, any
 * incremental fold that carries a label table across batches) it is a
 * time bomb: size-in-bytes estimates MULTIPLY through every join of every
 * iteration and are re-inherited by the next checkpoint, so the estimate's
 * BigInt digit count grows geometrically with iterations. Around the
 * 6th-9th compounding the driver spends MINUTES inside
 * `BigInteger.multiplyToomCook3` computing a statistic nobody needs
 * (observed: a 10-batch incremental-cluster loop pinned one core for 30+
 * minutes in stats estimation before any real work).
 *
 * `fresh` rebuilds the just-materialized checkpoint as a bare
 * `LogicalRDD` with DEFAULT statistics — same partitions, same rows, zero
 * copies (the `InternalRow` RDD is reused as-is) — resetting the
 * compounding at every iteration boundary. The only `private[sql]` call
 * is `SparkSession.internalCreateDataFrame`, the exact constructor Spark
 * itself uses for internal-row relations.
 */
object SparkInternals {

  /** `df.localCheckpoint(eager = true)`, then re-wrap the materialized
    * RDD with fresh (default) statistics. The returned frame's plan is a
    * single `LogicalRDD` over the checkpoint's partitions. */
  def freshLocalCheckpoint(df: DataFrame): DataFrame = {
    val classic = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    val cp = classic.localCheckpoint(true)
    internalFrame(classic.sparkSession, cp.queryExecution.toRdd, cp.schema)
  }

  /** Bare internal-row frame with default stats (the `private[sql]`
    * constructor this object exists to reach). */
  def internalFrame(spark: org.apache.spark.sql.classic.SparkSession,
                    rdd: RDD[InternalRow], schema: StructType): DataFrame =
    spark.internalCreateDataFrame(rdd, schema, isStreaming = false)

  /** Unpersist every cached RDD reachable from the frame's `LogicalRDD`
    * leaves — including checkpoint blocks hiding BELOW a derived
    * `MapPartitionsRDD` (a `freshLocalCheckpoint` plan wraps the persisted
    * checkpoint RDD in a narrow projection, so unpersisting the leaf RDD
    * itself would be a no-op on the blocks). Walks narrow dependency
    * chains only; stops at the first persisted RDD per chain. */
  def releaseCheckpointBlocks(df: DataFrame): Unit = {
    def walk(r: RDD[_]): Unit =
      if (r.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE)
        r.unpersist(blocking = false)
      else r.dependencies.foreach(d => walk(d.rdd))
    df.queryExecution.logical.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }.foreach(walk)
  }
}
