package graft.spark

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.SparkInternals
import org.scalatest.funsuite.AnyFunSuite

/**
 * Pins the properties `SparkInternals` exists for:
 *
 * 1. `freshLocalCheckpoint` resets plan statistics to the MEASURED block
 *    size. Spark's `localCheckpoint(eager = true)` rewrites the ORIGIN
 *    plan's size-in-bytes estimate into the checkpoint node, so an
 *    iterated checkpoint→join→checkpoint loop (connected components, any
 *    incremental fold carrying a label table across batches) compounds
 *    the estimate geometrically until the driver stalls in BigInteger
 *    math. Fresh checkpoints must stay SMALL and BOUNDED across
 *    iterations (measured bytes of a ~fixed-size relation) while bare
 *    checkpoints grow without bound — and, being measured, must keep a
 *    tiny relation broadcastable where default leaf stats would not.
 *
 * 2. `releaseCheckpointBlocks` finds and unpersists the checkpoint's
 *    storage blocks even when the persisted RDD sits BELOW a derived
 *    narrow RDD in the plan's leaf (the freshLocalCheckpoint wrapping),
 *    where unpersisting the leaf RDD itself would be a no-op.
 */
class SparkInternalsSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = Sessions.local(4, "internals-spec")

  private def sizeBits(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.stats.sizeInBytes.bigInteger.bitLength()

  test("freshLocalCheckpoint: same rows, measured + bounded stats across an iterated join loop") {
    import spark.implicits._
    val base = spark.range(0, 64).select(col("id"), (col("id") % 8).as("k"))

    def step(df: DataFrame): DataFrame =
      df.as("a").join(df.as("b"), "k").select(col("a.id").as("id"), col("k"))
        .groupBy("k").agg(min("id").as("id")).select("id", "k")

    // bare eager checkpoints inherit the joined plan's estimate each round
    var bare = base.localCheckpoint(true)
    var freshDf = SparkInternals.freshLocalCheckpoint(base)
    assert(freshDf.select("id").as[Long].collect().sorted.toSeq === (0L until 64L))
    val bareBits = Seq.newBuilder[Int]
    val freshBits = Seq.newBuilder[Int]
    (1 to 4).foreach { _ =>
      bare = step(bare).localCheckpoint(true)
      freshDf = SparkInternals.freshLocalCheckpoint(step(freshDf))
      bareBits += sizeBits(bare)
      freshBits += sizeBits(freshDf)
    }
    val bareSeq = bareBits.result(); val freshSeq = freshBits.result()
    // inherited stats compound: strictly growing magnitude round over round
    assert(bareSeq.zip(bareSeq.tail).forall { case (x, y) => y > x },
      s"expected compounding inherited stats, got $bareSeq")
    // measured stats stay small and bounded: an 8-row relation is a few
    // hundred bytes every round, never the default Long.MaxValue leaf
    // estimate (63 bits) and never the compounding inherited one
    assert(freshSeq.forall(_ < 32), s"expected measured (small) fresh stats, got $freshSeq bits")
    assert(freshSeq.max - freshSeq.min <= 2,
      s"expected ~constant measured stats across rounds, got $freshSeq")
    // and both loops still compute the same relation
    val a = bare.as[(Long, Long)].collect().toSet
    val b = freshDf.as[(Long, Long)].collect().toSet
    assert(a === b)
    SparkInternals.releaseCheckpointBlocks(bare)
    SparkInternals.releaseCheckpointBlocks(freshDf)
  }

  test("freshLocalCheckpoint: a small checkpoint still broadcasts downstream") {
    import spark.implicits._
    val small = SparkInternals.freshLocalCheckpoint(
      spark.range(0, 100).select(col("id"), (col("id") % 10).as("k")))
    val big = spark.range(0, 10000).select((col("id") % 100).as("k"), col("id").as("v"))
    val plan = big.join(small, "k").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"measured-stat checkpoint should broadcast:\n${plan.take(1500)}")
    SparkInternals.releaseCheckpointBlocks(small)
  }

  test("freshLocalCheckpointClusteredBy: declares the layout — a keyed join re-plans no exchange on the checkpoint side") {
    import org.apache.spark.sql.execution.LogicalRDD
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    val n = spark.sessionState.conf.numShufflePartitions
    // a hash-repartitioned relation checkpoints WITH its distribution
    // (dedup keyed on a superset of the key is layout-preserving — the
    // exact shape the connected-components edge setup certifies)…
    val parted = SparkInternals.freshLocalCheckpointClusteredBy(
      spark.range(0, 1000).select(col("id").as("v"), (col("id") % 7).as("payload"))
        .repartition(n, col("v"))
        .dropDuplicates("v", "payload"),
      key = "v")
    val declared = parted.queryExecution.logical.collect { case l: LogicalRDD => l.outputPartitioning }
    assert(declared.nonEmpty)
    declared.head match {
      case hp: HashPartitioning =>
        assert(hp.numPartitions === n)
        assert(hp.references.map(_.name).toSeq === Seq("v"))
      case other => fail(s"expected HashPartitioning, got $other")
    }
    // …so a join keyed on it exchanges ONLY the other side (the CC loop's
    // per-round edges ⋈ labels in the non-broadcast regime)
    val other = spark.range(0, 500).select(col("id").as("n"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = parted.join(other, col("v") === col("n"))
      assert(joined.count() === 500) // and the join is CORRECT on the declared layout
      val plan = joined.queryExecution.executedPlan.toString
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(exchanges === 1, s"expected only the non-checkpoint side to exchange:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    // plain freshLocalCheckpoint keeps the conservative Unknown declaration
    val flat = SparkInternals.freshLocalCheckpoint(spark.range(10).toDF("id"))
    val flatPart = flat.queryExecution.logical.collect { case l: LogicalRDD => l.outputPartitioning }
    assert(flatPart.forall(!_.isInstanceOf[HashPartitioning]), s"got $flatPart")
    SparkInternals.releaseCheckpointBlocks(parted)
    SparkInternals.releaseCheckpointBlocks(flat)
  }

  test("releaseCheckpointBlocks: unpersists blocks below the derived leaf RDD") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val cp = SparkInternals.freshLocalCheckpoint(spark.range(0, 1000).toDF("id"))
    assert(cp.count() === 1000)
    val added = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(added.nonEmpty, "eager checkpoint should register a persistent RDD")
    // the plan leaf is the re-wrapped RDD, not the persisted one: a naive
    // leaf-level unpersist would miss the blocks this walk must find
    SparkInternals.releaseCheckpointBlocks(cp)
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert(added.intersect(after).isEmpty,
      s"checkpoint blocks survived release: ${added.intersect(after)}")
  }

  test("releaseCheckpointBlocks: no-op on plans without checkpointed leaves") {
    SparkInternals.releaseCheckpointBlocks(spark.range(5).toDF("id"))
  }
}
