package graft.temporal

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * The union + one-window as-of composition must reproduce the brute-force
 * definition exactly: per left row, the right row with max (ts, rightId)
 * among same-key rows with ts <= leftTs; NULL payload when none exists.
 */
class AsofJoinSpec extends AnyFunSuite {
  private implicit lazy val spark: SparkSession =
    graft.spark.Sessions.local(4, "asof-spec")

  test("asof == brute force (random data, equal-ts inclusive, ties, unmatched)") {
    import spark.implicits._
    val rnd = new java.util.Random(11)
    // coarse ts grid forces equal-ts collisions on BOTH sides
    val trades = (1 to 800).map(i =>
      (i.toLong, (rnd.nextInt(8)).toLong, rnd.nextInt(40).toLong, rnd.nextDouble()))
    val quotes = (1 to 300).map(j =>
      (j.toLong, (rnd.nextInt(8)).toLong, rnd.nextInt(40).toLong, rnd.nextDouble()))
    val tDf = trades.toDF("event_id", "user_id", "ts", "trade_value")
    val qDf = quotes.toDF("quote_id", "user_id", "ts", "quote_value")
    val got = AsofJoin.asof(tDf, qDf, key = "user_id", ts = "ts",
        rightId = "quote_id", payload = Seq("quote_value"))
      .select("event_id", "quote_id")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val want = trades.map { case (eid, u, ts, _) =>
      val cands = quotes.filter(q => q._2 == u && q._3 <= ts)
      eid -> (if (cands.isEmpty) None
              else Some(cands.maxBy(q => (q._3, q._1))._1))
    }.toMap
    assert(got === want)
    assert(want.values.exists(_.isEmpty), "fixture must exercise unmatched rows")
    assert(want.values.exists(_.nonEmpty))
  }

  test("the plan is ONE exchange (key hash for the window) — no join node at all") {
    import spark.implicits._
    val tDf = Seq((1L, 1L, 5L, 1.0)).toDF("event_id", "user_id", "ts", "trade_value")
    val qDf = Seq((1L, 1L, 3L, 2.0)).toDF("quote_id", "user_id", "ts", "quote_value")
    val plan = AsofJoin.asof(tDf, qDf, "user_id", "ts", "quote_id", Seq("quote_value"))
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1, plan)
    assert(!plan.toLowerCase.contains("join"), plan)
  }

  test("NULL keys and NULL timestamps follow join semantics: they match nothing") {
    import spark.implicits._
    val tDf = Seq(
      (1L, null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(10L), 1.0),
      (2L, java.lang.Long.valueOf(1L), null.asInstanceOf[java.lang.Long], 2.0),
      (3L, java.lang.Long.valueOf(1L), java.lang.Long.valueOf(10L), 3.0))
      .toDF("event_id", "user_id", "ts", "trade_value")
    val qDf = Seq(
      (1L, null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(5L), 1.0), // NULL key: matches nothing
      (2L, java.lang.Long.valueOf(1L), null.asInstanceOf[java.lang.Long], 2.0), // NULL ts: matches nothing
      (3L, java.lang.Long.valueOf(1L), java.lang.Long.valueOf(5L), 3.0))
      .toDF("quote_id", "user_id", "ts", "quote_value")
    val got = AsofJoin.asof(tDf, qDf, "user_id", "ts", "quote_id", Seq("quote_value"))
      .select("event_id", "quote_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    // NULL-key left row: kept, NULL payload (a NULL-key quote never matches);
    // NULL-ts left row: kept, NULL payload (q.ts <= NULL is never true);
    // the normal row matches only the non-NULL quote
    assert(got === Map(1L -> None, 2L -> None, 3L -> Some(3L)))
  }

  test("non-integral rightId fails loudly (tie-break needs a total order)") {
    import spark.implicits._
    val tDf = Seq((1L, 1L, 5L, 1.0)).toDF("event_id", "user_id", "ts", "trade_value")
    val qDf = Seq(("a", 1L, 3L, 2.0)).toDF("quote_id", "user_id", "ts", "quote_value")
    val e = intercept[IllegalArgumentException] {
      AsofJoin.asof(tDf, qDf, "user_id", "ts", "quote_id", Seq("quote_value"))
    }
    assert(e.getMessage.contains("integral"))
  }

  test("equal timestamps match inclusively; larger quote_id wins the tie") {
    import spark.implicits._
    val tDf = Seq((10L, 1L, 100L, 0.0)).toDF("event_id", "user_id", "ts", "trade_value")
    val qDf = Seq(
      (1L, 1L, 100L, 1.0), (2L, 1L, 100L, 2.0), // both AT the trade ts
      (3L, 1L, 101L, 3.0), // after — must not match
      (4L, 2L, 90L, 4.0)) // other key — must not match
      .toDF("quote_id", "user_id", "ts", "quote_value")
    val row = AsofJoin.asof(tDf, qDf, "user_id", "ts", "quote_id", Seq("quote_value"))
      .select("quote_id", "quote_value").head()
    assert(row.getLong(0) === 2L && row.getDouble(1) === 2.0)
  }
}
