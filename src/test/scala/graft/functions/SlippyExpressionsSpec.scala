package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Slippy

/** The codegen'd slippy_cell expression must equal the kernel exactly, in
  * both codegen and interpreted (null-handling) paths. */
class SlippyExpressionsSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = graft.spark.Sessions.local(4, "expr-spec")

  test("slippy_cell == Slippy.worldTileLocalId over random coordinates") {
    implicit val s: SparkSession = spark
    import s.implicits._
    val rnd = new java.util.Random(3)
    val pts = (1 to 5000).map(_ => (rnd.nextDouble() * 360 - 180, rnd.nextDouble() * 170 - 85))
    val got = pts.toDF("lon", "lat")
      .select(SlippyFunctions.slippyCell(s, col("lon"), col("lat"), 14).as("cell"))
      .as[Long].collect()
    pts.zip(got).foreach { case ((lon, lat), cell) =>
      assert(cell === Slippy.worldTileLocalId(lon, lat, 14))
    }
  }

  test("registered for SQL use; null propagates") {
    implicit val s: SparkSession = spark
    SlippyFunctions.register(s)
    val row = s.sql("SELECT slippy_cell(4.3517d, 50.8503d, 14) AS c, slippy_cell(CAST(NULL AS DOUBLE), 1.0d, 14) AS n")
      .collect().head
    assert(row.getLong(0) === Slippy.worldTileLocalId(4.3517, 50.8503, 14))
    assert(row.isNullAt(1))
  }

  test("whole-stage codegen keeps the expression inline (no UDF in the plan)") {
    implicit val s: SparkSession = spark
    import s.implicits._
    val df = Seq((4.35, 50.85)).toDF("lon", "lat")
      .select(SlippyFunctions.slippyCell(s, col("lon"), col("lat"), 14))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"), plan)
  }
}
