package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * The custom broadcast range join (injected RangeJoinStrategy +
 * BroadcastRangeJoinExec) must (a) fire on the naive interval-predicate
 * join shape, (b) reproduce stock Spark's BroadcastNestedLoopJoin answer
 * EXACTLY — including null, NaN, boundary-inclusive and overlap semantics —
 * and (c) leave every other join shape to the built-in planner.
 */
class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = {
    val s = graft.spark.Sessions.local(4, "range-join-spec")
    RangeJoin.register(s)
    s
  }

  // ---- IntervalIndex kernel vs brute force ----

  test("IntervalIndex: stabbing queries == brute force (duplicates, nesting, degenerate, NaN)") {
    val rnd = new java.util.Random(7)
    val n = 400
    val lo = new Array[Double](n)
    val hi = new Array[Double](n)
    for (i <- 0 until n) {
      val a = math.floor(rnd.nextDouble() * 50) / 5.0
      val b = a + math.floor(rnd.nextDouble() * 20) / 5.0
      // mix in: duplicates of the previous interval, point intervals,
      // degenerate lo>hi (must match nothing), NaN bounds (must match nothing)
      rnd.nextInt(10) match {
        case 0 if i > 0 => lo(i) = lo(i - 1); hi(i) = hi(i - 1)
        case 1 => lo(i) = a; hi(i) = a
        case 2 => lo(i) = b; hi(i) = a - 1.0
        case 3 => lo(i) = Double.NaN; hi(i) = b
        case 4 => lo(i) = a; hi(i) = Double.NaN // nanSafe: an unbounded top
        case _ => lo(i) = a; hi(i) = b
      }
    }
    val idx = IntervalIndex.build(lo, hi)
    val out = new scala.collection.mutable.ArrayBuffer[Int]
    val cmp = RangeJoin.cmp _
    val queries = (0 to 170).map(i => -1.0 + i * 0.1) :+ Double.NaN
    for (q <- queries) {
      out.clear()
      idx.query(q, out)
      val want = (0 until n).filter(i => cmp(lo(i), q) <= 0 && cmp(q, hi(i)) <= 0).toSet
      assert(out.toSet === want, s"q=$q")
      assert(out.size === out.toSet.size, s"q=$q reported an interval twice")
    }
    // NaN query matches exactly the NaN-upper-bound intervals (Spark's
    // nanSafe order: NaN == NaN, NaN > everything)
    out.clear(); idx.query(Double.NaN, out)
    assert(out.toSet === (0 until n).filter(i => hi(i).isNaN && !lo(i).isNaN).toSet)
  }

  test("IntervalIndex: all-empty build yields a null tree and empty queries") {
    val idx = IntervalIndex.build(Array(5.0, Double.NaN), Array(1.0, 9.0))
    val out = new scala.collection.mutable.ArrayBuffer[Int]
    if (idx != null) { idx.query(3.0, out); assert(out.isEmpty) }
  }

  // ---- plan shape ----

  private def bboxJoin(s: SparkSession): DataFrame = {
    implicit val sp: SparkSession = s
    graft.geo.SpatialJoins.rangeJoinBBox(
      graft.queries.GraftQueries.eventPoints(s, "/root/testdata/sf0.001"),
      graft.queries.GraftQueries.TestRegions)
  }

  test("strategy fires: bbox join plans as BroadcastRangeJoinExec, not BNLJ") {
    val plan = bboxJoin(spark).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastRangeJoin"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    // the build side arrives through a standard reusable broadcast exchange
    assert(plan.contains("BroadcastExchange"), plan)
  }

  test("equi-joins and disabled sessions keep the stock planner") {
    implicit val s: SparkSession = spark
    import s.implicits._
    val a = Seq((1L, 2.0), (2L, 3.0)).toDF("k", "x")
    val b = Seq((1L, 1.0, 5.0)).toDF("k", "lo", "hi")
    // an equi-conjunct beside the range pair → hash join keeps it
    val equi = a.join(b, a("k") === b("k") && a("x") >= b("lo") && a("x") <= b("hi"))
    assert(!equi.queryExecution.executedPlan.toString.contains("BroadcastRangeJoin"))
    assert(equi.collect().length === 1)
    // conf kill-switch → BNLJ
    s.conf.set(RangeJoin.EnabledKey, "false")
    try {
      val off = bboxJoin(s).queryExecution.executedPlan.toString
      assert(!off.contains("BroadcastRangeJoin"), off)
    } finally s.conf.set(RangeJoin.EnabledKey, "true")
  }

  // ---- semantics vs stock Spark ----

  private def withDisabled[T](s: SparkSession)(f: => T): T = {
    s.conf.set(RangeJoin.EnabledKey, "false")
    try f finally s.conf.set(RangeJoin.EnabledKey, "true")
  }

  test("bbox join == BNLJ answer on the geo fixture (overlaps + residual lat)") {
    val got = bboxJoin(spark).select("pid", "region_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = withDisabled(spark) {
      bboxJoin(spark).select("pid", "region_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(got === want)
    assert(want.nonEmpty)
    // sf0.001 points span lon [3, 4): regions 1 and 3 must both be hit
    assert(want.map(_._2).size >= 2, s"regions hit: ${want.map(_._2)}")
  }

  test("random intervals: custom exec == BNLJ incl. nulls, NaN, inclusive bounds") {
    implicit val s: SparkSession = spark
    import s.implicits._
    val rnd = new java.util.Random(13)
    val pts = (1 to 3000).map { i =>
      val v: java.lang.Double = rnd.nextInt(20) match {
        case 0 => null
        case 1 => Double.NaN
        case _ => math.floor(rnd.nextDouble() * 1000) / 10.0
      }
      (i.toLong, v)
    }
    val ivs = (1 to 120).map { j =>
      val lo: java.lang.Double = rnd.nextInt(15) match {
        case 0 => null
        case 1 => Double.NaN
        case _ => math.floor(rnd.nextDouble() * 900) / 10.0
      }
      val hi: java.lang.Double =
        if (lo == null || lo.isNaN) math.floor(rnd.nextDouble() * 900) / 10.0
        else if (rnd.nextInt(10) == 0) Double.NaN // nanSafe unbounded top
        else lo + rnd.nextInt(100) / 10.0
      (j.toLong, lo, hi)
    }
    val p = pts.toDF("pid", "x")
    val iv = ivs.toDF("iid", "lo", "hi")
    val joinCond = p("x") >= iv("lo") && p("x") <= iv("hi")
    val on = p.join(iv, joinCond).select("pid", "iid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p.join(iv, joinCond).queryExecution.executedPlan.toString
      .contains("BroadcastRangeJoin"))
    val off = withDisabled(s) {
      p.join(iv, joinCond).select("pid", "iid")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(on === off)
    assert(on.nonEmpty)
    // inclusive boundary sanity: plant an exact-endpoint hit and re-check
    val pb = Seq((9001L, 42.0)).toDF("pid", "x")
    val ib = Seq((9001L, 42.0, 42.0)).toDF("iid", "lo", "hi")
    assert(pb.join(ib, pb("x") >= ib("lo") && pb("x") <= ib("hi")).count() === 1)
  }

  test("two range joins sharing one reused broadcast index DIFFERENT bound columns") {
    // regression: the executor-side tree memo must key on the plan node,
    // not the broadcast id alone — ReuseExchange gives both joins the same
    // broadcast, but one indexes (left, right) and the other (bottom, top)
    implicit val s: SparkSession = spark
    import s.implicits._
    val boxes = Seq((1L, 10.0, 20.0, 100.0, 110.0), (2L, 15.0, 30.0, 200.0, 220.0))
      .toDF("bid", "lft", "rgt", "bot", "top").cache()
    val pts = (1 to 400).map(i => (i.toLong, i / 10.0, i * 5.0)).toDF("pid", "x", "y")
    def byX = pts.join(boxes, pts("x") >= boxes("lft") && pts("x") <= boxes("rgt"))
      .select(col("pid"), col("bid"), lit("x").as("dim"))
    def byY = pts.join(boxes, pts("y") >= boxes("bot") && pts("y") <= boxes("top"))
      .select(col("pid"), col("bid"), lit("y").as("dim"))
    val u = byX.union(byY)
    assert(u.queryExecution.executedPlan.toString.contains("BroadcastRangeJoin"))
    val got = u.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val want = withDisabled(s) {
      byX.union(byY).collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    }
    assert(got === want)
    // both dimensions actually contributed rows (the bug collapses one onto
    // the other's tree)
    assert(got.exists(_._3 == "x") && got.exists(_._3 == "y"))
  }

  test("an explicit user join hint wins: the strategy stands aside") {
    implicit val s: SparkSession = spark
    import s.implicits._
    val p = (1 to 200).map(i => (i.toLong, i / 10.0)).toDF("pid", "x")
    val iv = Seq((1L, 5.0, 9.0)).toDF("iid", "lo", "hi")
    val hinted = p.join(iv.hint("shuffle_replicate_nl"),
      p("x") >= iv("lo") && p("x") <= iv("hi"))
    assert(!hinted.queryExecution.executedPlan.toString.contains("BroadcastRangeJoin"),
      hinted.queryExecution.executedPlan.toString)
    val want = p.join(iv, p("x") >= iv("lo") && p("x") <= iv("hi")).count()
    assert(hinted.count() === want)
  }

  test("null-safe equi-conjunct joins are left to the hash-join planner") {
    implicit val s: SparkSession = spark
    import s.implicits._
    val a = Seq((1L, 2.0), (2L, 3.0)).toDF("k", "x")
    val b = Seq((1L, 1.0, 5.0)).toDF("k", "lo", "hi")
    val nsafe = a.join(b, a("k") <=> b("k") && a("x") >= b("lo") && a("x") <= b("hi"))
    assert(!nsafe.queryExecution.executedPlan.toString.contains("BroadcastRangeJoin"))
    assert(nsafe.collect().length === 1)
  }

  test("build side on the LEFT works too (reversed operands)") {
    implicit val s: SparkSession = spark
    import s.implicits._
    val iv = Seq((1L, 10.0, 20.0), (2L, 15.0, 30.0)).toDF("iid", "lo", "hi")
    val p = (1 to 500).map(i => (i.toLong, i / 10.0)).toDF("pid", "x")
    val j = iv.join(p, p("x") >= iv("lo") && p("x") <= iv("hi"))
    assert(j.queryExecution.executedPlan.toString.contains("BroadcastRangeJoin"),
      j.queryExecution.executedPlan.toString)
    val got = j.select("iid", "pid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      (iid, lo, hi) <- Seq((1L, 10.0, 20.0), (2L, 15.0, 30.0))
      i <- 1 to 500
      if i / 10.0 >= lo && i / 10.0 <= hi
    } yield (iid, i.toLong)).toSet
    assert(got === want)
  }
}
