package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.DoubleType

/**
 * Broadcast RANGE join — a whole-operator Catalyst extension (logical
 * pattern → custom SparkPlan via an injected Strategy), the rung of the
 * custom-operator ladder the rest of the engine hasn't needed: Spark has no
 * physical operator for a pure interval predicate (`r.lo <= p.x AND
 * p.x <= r.hi`) and plans it as BroadcastNestedLoopJoin — every stream row
 * against EVERY build row, O(|stream| × |build|) comparisons. For the
 * engine's geo tier (points × bbox regions) that is the difference between
 * 600k × 200 = 120M predicate evaluations and 600k interval-tree stabbing
 * queries of O(log 200 + hits) each.
 *
 * Shape at scale: the build (interval) side is driver-collected and
 * broadcast — the same contract as Spark's own BroadcastHashJoin, gated on
 * `spark.sql.autoBroadcastJoinThreshold` — while the probe side streams
 * partition-parallel with zero shuffle. 100 TB of points against a
 * region/benchmark/calendar table is exactly this asymmetry; a
 * big × big interval join would instead go through the cell-cover
 * equi-join (`geo/SpatialJoins.pointInRegion`), which this operator
 * complements, not replaces.
 *
 * Semantics: INNER join, key BETWEEN lo AND hi (inclusive both ends, the
 * SQL BETWEEN desugaring), all three expressions DoubleType; every other
 * conjunct (e.g. the second dimension of a bbox) is evaluated as a residual
 * filter on the joined row. Joins that carry an equi-conjunct are left to
 * the hash-join planner untouched. Doubles compare with Spark's own
 * NaN-safe total order (NaN greatest, NaN == NaN, -0.0 == 0.0 — the
 * `Utils.nanSafeCompareDoubles` codegen semantics), and NULL keys/bounds
 * match nothing — bit-for-bit the BroadcastNestedLoopJoin answer, verified
 * in RangeJoinSpec including the NaN corners.
 */
object RangeJoin {
  val EnabledKey = "spark.graft.rangeJoin.enabled"

  /** Idempotently add the strategy to a live session (the in-repo path;
    * spark-submit users get it via GraftExtensions / spark.sql.extensions). */
  def register(spark: SparkSession): Unit = synchronized {
    val cur = spark.experimental.extraStrategies
    if (!cur.exists(_.isInstanceOf[RangeJoinStrategy.type]))
      spark.experimental.extraStrategies = cur :+ RangeJoinStrategy
  }

  /** Spark SQL's double comparison (Utils.nanSafeCompareDoubles): NaN is
    * greater than everything and equal to itself; -0.0 == 0.0. */
  @inline def cmp(x: Double, y: Double): Int =
    if (x < y) -1
    else if (x > y) 1
    else if (x == y) 0
    else { // at least one NaN
      val xn = java.lang.Double.isNaN(x)
      val yn = java.lang.Double.isNaN(y)
      if (xn && yn) 0 else if (xn) 1 else -1
    }
}

/**
 * Static centered interval tree over double intervals, built once on the
 * driver and broadcast. Stabbing query: all intervals containing q in
 * O(log n + hits). Endpoints are inclusive; comparisons use Spark's
 * NaN-safe order (so a NaN upper bound behaves as +∞-and-beyond, exactly
 * like the BNLJ predicate); intervals with lo > hi under that order can
 * contain nothing and are dropped at build.
 */
final class IntervalIndex private (
    val center: Double,
    val byLoIdx: Array[Int], val byLoLo: Array[Double],
    val byHiIdx: Array[Int], val byHiHi: Array[Double],
    val left: IntervalIndex, val right: IntervalIndex) extends Serializable {
  import RangeJoin.cmp

  /** Append the ids of all intervals containing q. */
  def query(q: Double, out: scala.collection.mutable.ArrayBuffer[Int]): Unit = {
    var node = this
    while (node != null) {
      val c = cmp(q, node.center)
      if (c < 0) {
        // mid intervals sorted by lo asc: report while lo <= q (hi >= center > q holds)
        var i = 0
        while (i < node.byLoLo.length && cmp(node.byLoLo(i), q) <= 0) {
          out += node.byLoIdx(i); i += 1
        }
        node = node.left
      } else if (c > 0) {
        // mid intervals sorted by hi desc: report while hi >= q (lo <= center < q holds)
        var i = 0
        while (i < node.byHiHi.length && cmp(node.byHiHi(i), q) >= 0) {
          out += node.byHiIdx(i); i += 1
        }
        node = node.right
      } else {
        var i = 0
        while (i < node.byLoIdx.length) { out += node.byLoIdx(i); i += 1 }
        node = null
      }
    }
  }
}

object IntervalIndex {
  import RangeJoin.cmp

  /** Build over parallel lo/hi arrays; id i refers to the caller's row i.
    * `valid(i) == false` (e.g. a NULL bound) and empty (lo > hi) intervals
    * are excluded — they contain no point. Returns null when nothing
    * remains. */
  def build(lo: Array[Double], hi: Array[Double],
      valid: Array[Boolean] = null): IntervalIndex = {
    val ids = Array.range(0, lo.length).filter(i =>
      (valid == null || valid(i)) && cmp(lo(i), hi(i)) <= 0)
    buildRec(ids, lo, hi)
  }

  private val ord = new Ordering[Double] {
    def compare(x: Double, y: Double): Int = cmp(x, y)
  }

  private def buildRec(ids: Array[Int], lo: Array[Double], hi: Array[Double]): IntervalIndex = {
    if (ids.isEmpty) return null
    // median of all endpoints keeps the tree balanced under skewed layouts
    val endpoints = new Array[Double](ids.length * 2)
    var i = 0
    while (i < ids.length) {
      endpoints(2 * i) = lo(ids(i)); endpoints(2 * i + 1) = hi(ids(i)); i += 1
    }
    // Arrays.sort's double order (NaN last) agrees with cmp up to the
    // -0.0/0.0 tie, which cannot affect a median pick
    java.util.Arrays.sort(endpoints)
    val center = endpoints(endpoints.length / 2)
    val leftIds = ids.filter(id => cmp(hi(id), center) < 0)
    val rightIds = ids.filter(id => cmp(lo(id), center) > 0)
    val midIds = ids.filter(id => cmp(lo(id), center) <= 0 && cmp(hi(id), center) >= 0)
    val byLo = midIds.sortBy(lo(_))(ord)
    val byHi = midIds.sortBy(hi(_))(ord.reverse)
    new IntervalIndex(center,
      byLo, byLo.map(lo(_)), byHi, byHi.map(hi(_)),
      buildRec(leftIds, lo, hi), buildRec(rightIds, lo, hi))
  }
}

/**
 * Physical broadcast range join. Children keep the logical (left, right)
 * order so `output` matches the logical join; `buildRight` says which child
 * is broadcast. The build side arrives through a standard
 * BroadcastExchangeExec (required BroadcastDistribution with
 * IdentityBroadcastMode — the BroadcastNestedLoopJoin contract), so it gets
 * exchange reuse, driver-memory accounting and the broadcast timeout for
 * free; the interval tree is derived from the broadcast rows once per
 * executor (memoized on the broadcast id — an O(m log m) build, not worth a
 * custom BroadcastMode).
 */
case class BroadcastRangeJoinExec(
    streamKey: Expression,
    buildLo: Expression,
    buildHi: Expression,
    residual: Option[Expression],
    buildRight: Boolean,
    left: SparkPlan,
    right: SparkPlan) extends SparkPlan with BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override lazy val metrics: Map[String, org.apache.spark.sql.execution.metric.SQLMetric] =
    Map("numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"))

  override def requiredChildDistribution
      : Seq[org.apache.spark.sql.catalyst.plans.physical.Distribution] = {
    import org.apache.spark.sql.catalyst.plans.physical._
    if (buildRight) Seq(UnspecifiedDistribution, BroadcastDistribution(IdentityBroadcastMode))
    else Seq(BroadcastDistribution(IdentityBroadcastMode), UnspecifiedDistribution)
  }

  /** Rows stay where (and in the order) the stream side put them —
    * broadcast joins preserve the probe side's partitioning and ordering,
    * letting downstream ops reuse both without re-exchanging. */
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    (if (buildRight) left else right).outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    (if (buildRight) left else right).outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val (streamed, build) = if (buildRight) (left, right) else (right, left)
    val bc = build.executeBroadcast[Array[InternalRow]]()
    val loEval = BindReferences.bindReference(buildLo, build.output)
    val hiEval = BindReferences.bindReference(buildHi, build.output)
    val keyExpr = BindReferences.bindReference(streamKey, streamed.output)
    val allAttrs = output
    val residualExpr = residual
    val isBuildRight = buildRight
    val numOutputRows = longMetric("numOutputRows")
    // memo key: THIS plan node + THIS broadcast. The plan id disambiguates
    // two range joins whose build sides share one reused BroadcastExchange
    // but index different bound columns (same bc.id, different trees), and
    // plan ids are JVM-monotonic so a restarted context reusing broadcast
    // ids can never alias a stale entry.
    val memoKey = (id, bc.id)

    streamed.execute().mapPartitionsWithIndex { (pidx, iter) =>
      val rows = bc.value
      val idx = BroadcastRangeJoinExec.treeFor(memoKey) {
        val lo = new Array[Double](rows.length)
        val hi = new Array[Double](rows.length)
        val valid = new Array[Boolean](rows.length)
        var i = 0
        while (i < rows.length) {
          val l = loEval.eval(rows(i)); val h = hiEval.eval(rows(i))
          valid(i) = l != null && h != null // NULL bounds satisfy no comparison
          if (valid(i)) { lo(i) = l.asInstanceOf[Double]; hi(i) = h.asInstanceOf[Double] }
          i += 1
        }
        Option(IntervalIndex.build(lo, hi, valid))
      }.orNull
      val joined = new JoinedRow
      val resPred = residualExpr.map { e =>
        val p = Predicate.create(e, allAttrs)
        p.initialize(pidx)
        p
      }
      val proj = UnsafeProjection.create(allAttrs, allAttrs)
      proj.initialize(pidx)
      val hits = new scala.collection.mutable.ArrayBuffer[Int](16)
      iter.flatMap { srow =>
        val k = keyExpr.eval(srow)
        if (k == null || idx == null) Iterator.empty
        else {
          hits.clear()
          idx.query(k.asInstanceOf[Double], hits)
          hits.iterator
            .map { bi =>
              if (isBuildRight) joined(srow, rows(bi)) else joined(rows(bi), srow)
            }
            .filter(r => resPred.forall(_.eval(r)))
            .map { r => numOutputRows += 1; proj(r) }
        }
      }
    }
  }
}

object BroadcastRangeJoinExec {
  private val MaxTrees = 64

  /** Executor-side memo of the interval tree per broadcast id (the tree is
    * derived state over the broadcast rows — built once per executor, not
    * per task). Bounded by per-entry LRU eviction (access-order
    * LinkedHashMap): a resident session replanning more than MaxTrees
    * distinct range joins evicts only the least-recently-used tree, never
    * the ones live tasks are stabbing (the old wholesale clear() forced
    * concurrent tasks to rebuild trees they were using, and
    * clear()+computeIfAbsent could rebuild one key twice). The map lock
    * also serializes the first build per key, so duplicate O(m log m)
    * builds are impossible; a rebuild after eviction is idempotent. */
  private val treeCache =
    new java.util.LinkedHashMap[(Int, Long), Option[IntervalIndex]](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(Int, Long), Option[IntervalIndex]]): Boolean =
        size() > MaxTrees
    }

  private[plans] def treeFor(key: (Int, Long))(
      build: => Option[IntervalIndex]): Option[IntervalIndex] =
    treeCache.synchronized {
      val cur = treeCache.get(key)
      if (cur != null) cur
      else { val built = build; treeCache.put(key, built); built }
    }
}

/**
 * Planner strategy: INNER join, no equi-conjunct, with a `lo <= key <= hi`
 * conjunct pair whose key streams from one side and whose bounds come from
 * the other (broadcast-small, gated on autoBroadcastJoinThreshold) → one
 * BroadcastRangeJoinExec; every other plan shape falls through to the
 * built-in planner untouched.
 */
object RangeJoinStrategy extends SparkStrategy with PredicateHelper {

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    // an explicit user join hint (broadcast, merge, shuffle_replicate_nl…)
    // is the physical-plan escape hatch — honor it by standing aside, the
    // same way built-in strategies branch on hints
    case Join(left, right, Inner, Some(cond), hint)
        if enabled && hint.leftHint.isEmpty && hint.rightHint.isEmpty =>
      val conjuncts = splitConjunctivePredicates(cond)
      if (hasEquiConjunct(conjuncts, left, right)) Nil
      else {
        tryRangeJoin(streamSide = left, buildSide = right, buildRight = true, conjuncts, left, right)
          .orElse(tryRangeJoin(streamSide = right, buildSide = left, buildRight = false, conjuncts, left, right))
          .toSeq
      }
    case _ => Nil
  }

  private def enabled: Boolean =
    SQLConf.get.getConfString(RangeJoin.EnabledKey, "true").toBoolean

  private def hasEquiConjunct(
      conjuncts: Seq[Expression], left: LogicalPlan, right: LogicalPlan): Boolean =
    conjuncts.exists {
      case Equality(a, b) => // EqualTo or EqualNullSafe — both hash-joinable
        (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
          (a.references.subsetOf(right.outputSet) && b.references.subsetOf(left.outputSet))
      case _ => false
    }

  /** key >= lo conjuncts, normalized to (key, lo, original). */
  private def lowerBounds(
      conjuncts: Seq[Expression], stream: LogicalPlan, build: LogicalPlan) =
    conjuncts.collect {
      case e @ GreaterThanOrEqual(k, b) if sides(k, b, stream, build) => (k, b, e)
      case e @ LessThanOrEqual(b, k) if sides(k, b, stream, build) => (k, b, e)
    }

  /** key <= hi conjuncts, normalized to (key, hi, original). */
  private def upperBounds(
      conjuncts: Seq[Expression], stream: LogicalPlan, build: LogicalPlan) =
    conjuncts.collect {
      case e @ LessThanOrEqual(k, b) if sides(k, b, stream, build) => (k, b, e)
      case e @ GreaterThanOrEqual(b, k) if sides(k, b, stream, build) => (k, b, e)
    }

  private def sides(k: Expression, b: Expression,
      stream: LogicalPlan, build: LogicalPlan): Boolean =
    k.dataType == DoubleType && b.dataType == DoubleType &&
      k.references.nonEmpty && k.references.subsetOf(stream.outputSet) &&
      b.references.subsetOf(build.outputSet) && k.deterministic && b.deterministic

  private def tryRangeJoin(
      streamSide: LogicalPlan, buildSide: LogicalPlan, buildRight: Boolean,
      conjuncts: Seq[Expression],
      left: LogicalPlan, right: LogicalPlan): Option[SparkPlan] = {
    val threshold = SQLConf.get.autoBroadcastJoinThreshold
    if (threshold <= 0 || buildSide.stats.sizeInBytes > threshold) return None
    val pair = (for {
      (k1, lo, e1) <- lowerBounds(conjuncts, streamSide, buildSide).iterator
      (k2, hi, e2) <- upperBounds(conjuncts, streamSide, buildSide).iterator
      if k1.semanticEquals(k2) && (e1 ne e2)
    } yield (k1, lo, hi, e1, e2)).nextOption()
    pair.map { case (key, lo, hi, e1, e2) =>
      val residual = conjuncts.filterNot(c => (c eq e1) || (c eq e2)).reduceOption(And)
      BroadcastRangeJoinExec(key, lo, hi, residual, buildRight,
        planLater(left), planLater(right))
    }
  }
}
