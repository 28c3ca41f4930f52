package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.plans.logical.Statistics
import org.apache.spark.sql.catalyst.plans.physical.UnknownPartitioning
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.types.StructType
import org.apache.spark.storage.StorageLevel

/**
 * Package bridge for a handful of `private[sql]` entry points.
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
 * `freshLocalCheckpoint` rebuilds the just-materialized checkpoint as a
 * bare `LogicalRDD` whose statistics are the MEASURED byte size of the
 * persisted blocks — the one moment in a plan's life when size is a fact,
 * not an estimate. Same partitions, same rows, zero copies (the
 * `InternalRow` RDD is reused as-is). The estimate chain resets at every
 * iteration boundary (no compounding, ever) AND downstream join planning
 * still broadcasts genuinely small checkpoints — inherited estimates
 * could only guess at both (measured on the CC family: default-stat fresh
 * checkpoints lost broadcast and cost ~25 % at bench scale; inherited
 * stats stall the driver after ~10 folds).
 */
object SparkInternals {

  /** `df.localCheckpoint(eager = true)`, then re-wrap the materialized
    * RDD as a fresh `LogicalRDD` carrying the checkpoint's measured
    * storage size as its statistics (default leaf stats if the block
    * manager has no record, e.g. an empty relation's zero-byte entry —
    * conservatively huge, never compounding).
    *
    * (`Dataset.localCheckpoint` nominally preserves the executed plan's
    * output partitioning in its `LogicalRDD`, but under AQE the
    * `AdaptiveSparkPlanExec` node reports `UnknownPartitioning`, so the
    * checkpoint records nothing — use `freshLocalCheckpointClusteredBy`
    * when a checkpoint's physical distribution must survive for
    * downstream exchange elision.) */
  def freshLocalCheckpoint(df: DataFrame): DataFrame = {
    val classic = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    val session = classic.sparkSession
    val cp = classic.localCheckpoint(true)
    val rdd = cp.queryExecution.toRdd
    val stats = measuredBytes(session, rdd).map(b => Statistics(sizeInBytes = BigInt(b)))
    val attrs = org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(cp.schema)
    org.apache.spark.sql.classic.Dataset.ofRows(session,
      new LogicalRDD(attrs, rdd, UnknownPartitioning(0), Nil, false, None)(
        session, stats, None))
  }

  /** `freshLocalCheckpoint` that DECLARES the checkpoint to be
    * hash-distributed by `key` across exactly `numShufflePartitions`
    * partitions. The CALLER certifies the physical layout: the input must
    * be `repartition(numShufflePartitions, col(key))` followed only by
    * row-location-preserving operators (filter, projection keeping `key`,
    * aggregation whose grouping keys include `key` — anything
    * `EnsureRequirements` plans without a new exchange). The declaration
    * lets every downstream join/aggregation clustered on `key` skip
    * re-exchanging the checkpoint — for an ITERATED consumer (the
    * connected-components loop joins the same checkpointed edge relation
    * every round) that is one edge-sized shuffle per round in the
    * non-broadcast regime. A wrong certification would silently
    * mis-join, hence the partition-count guard here and result-exactness
    * specs at every call site (DedupJobsSpec runs the CC loop against
    * union-find with broadcast disabled so the declared layout is the one
    * actually joined on). */
  def freshLocalCheckpointClusteredBy(df: DataFrame, key: String): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.physical.{HashPartitioning => HP}
    val classic = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    val session = classic.sparkSession
    val n = session.sessionState.conf.numShufflePartitions
    val cp = classic.localCheckpoint(true)
    val rdd = cp.queryExecution.toRdd
    require(rdd.getNumPartitions == n,
      s"clustered checkpoint: expected $n partitions (numShufflePartitions), got " +
        s"${rdd.getNumPartitions} — the input must be repartition($n, col($key)) " +
        "followed only by layout-preserving operators")
    val stats = measuredBytes(session, rdd).map(b => Statistics(sizeInBytes = BigInt(b)))
    val attrs = org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(cp.schema)
    val keyAttr = attrs.find(_.name == key).getOrElse(
      sys.error(s"clustered checkpoint: no column '$key' in ${cp.schema.fieldNames.mkString(", ")}"))
    org.apache.spark.sql.classic.Dataset.ofRows(session,
      new LogicalRDD(attrs, rdd, HP(Seq(keyAttr), n), Nil, false, None)(
        session, stats, None))
  }

  /** Block-manager byte footprint (mem + disk) of the first persisted RDD
    * under `rdd` — for an eager local checkpoint, the exact size of the
    * materialized UnsafeRow blocks. At least 1 so a measured-empty
    * relation stays broadcastable instead of falling to default stats. */
  private def measuredBytes(session: org.apache.spark.sql.classic.SparkSession,
                            rdd: RDD[_]): Option[Long] = {
    def firstPersisted(r: RDD[_]): Option[RDD[_]] =
      if (r.getStorageLevel != StorageLevel.NONE) Some(r)
      else r.dependencies.view.flatMap(d => firstPersisted(d.rdd)).headOption
    for {
      p <- firstPersisted(rdd)
      info <- session.sparkContext.getRDDStorageInfo.find(_.id == p.id)
    } yield math.max(info.memSize + info.diskSize, 1L)
  }

  /** Bare internal-row frame with default stats (kept for callers that
    * WANT the broadcast-hostile conservative estimate). */
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
      if (r.getStorageLevel != StorageLevel.NONE)
        r.unpersist(blocking = false)
      else r.dependencies.foreach(d => walk(d.rdd))
    df.queryExecution.logical.collect {
      case l: LogicalRDD => l.rdd
    }.foreach(walk)
  }
}
