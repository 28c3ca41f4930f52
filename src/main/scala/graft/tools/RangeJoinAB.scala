package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * A/B the custom broadcast range join (graft.plans.BroadcastRangeJoinExec)
 * against stock Spark's plan for the same interval-predicate join
 * (BroadcastNestedLoopJoin): n points stabbing m intervals. The custom exec
 * does n interval-tree queries of O(log m + hits); BNLJ does n × m
 * predicate evaluations — the gap grows linearly with the build side.
 *
 * Prints one JSON line with wall seconds per variant (min-of-3, warmed) and
 * the verified-equal result cardinality. Usage:
 *   runMain graft.tools.RangeJoinAB [nPoints] [nIntervals] [cpus]
 */
object RangeJoinAB {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 2000000
    val m = if (args.length > 1) args(1).toInt else 400
    val cpus = if (args.length > 2) args(2).toInt
      else sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(32)
    implicit val spark: SparkSession = graft.spark.Sessions.local(cpus, "range-join-ab")
    graft.plans.RangeJoin.register(spark)
    import spark.implicits._

    // points over [0, 1000); interval width scales as 1000/m so expected
    // hits stay ~1/point regardless of build size — the A/B then measures
    // pure probe cost (tree stab vs m predicate evals), not output volume
    val width = 1000.0 / m
    val pts = spark.range(n.toLong)
      .select(col("id").as("pid"),
        (col("id") % 100000).cast("double") / 100.0 as "x")
      .cache()
    pts.count()
    val ivs = (0 until m).map { j =>
      val lo = (j * 2654435761L % 99800L) / 100.0
      (j.toLong, lo, lo + width)
    }.toDF("iid", "lo", "hi").cache()
    ivs.count()

    def joined: DataFrame =
      pts.join(ivs, pts("x") >= ivs("lo") && pts("x") <= ivs("hi"))
    def timedCount(df: DataFrame): (Double, Long) = {
      val t0 = System.nanoTime(); val c = df.count()
      ((System.nanoTime() - t0) / 1e9, c)
    }
    def run(enabled: Boolean): (Double, Long) = {
      spark.conf.set(graft.plans.RangeJoin.EnabledKey, enabled.toString)
      try {
        val plan = joined.queryExecution.executedPlan.toString
        val wantNode = if (enabled) "BroadcastRangeJoin" else "BroadcastNestedLoopJoin"
        require(plan.contains(wantNode), s"expected $wantNode in:\n$plan")
        timedCount(joined) // warm
        (1 to 3).map(_ => timedCount(joined)).minBy(_._1)
      } finally spark.conf.set(graft.plans.RangeJoin.EnabledKey, "true")
    }

    val (customSec, customRows) = run(enabled = true)
    val (bnljSec, bnljRows) = run(enabled = false)
    require(customRows == bnljRows, s"row mismatch: $customRows vs $bnljRows")
    println(s"""{"points":$n,"intervals":$m,"cpus":$cpus,"rows":$customRows,""" +
      s""""range_join_sec":${math.rint(customSec * 100) / 100},""" +
      s""""bnlj_sec":${math.rint(bnljSec * 100) / 100},""" +
      s""""speedup":${math.rint(bnljSec / customSec * 10) / 10}}""")
    spark.stop()
  }
}
