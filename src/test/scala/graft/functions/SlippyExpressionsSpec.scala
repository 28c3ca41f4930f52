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

  test("quad_key == Slippy.worldToQuadKey; hierarchical prefix holds column-wise") {
    implicit val s: SparkSession = spark
    import s.implicits._
    val rnd = new java.util.Random(7)
    val pts = (1 to 3000).map(_ => (rnd.nextDouble() * 360 - 180, rnd.nextDouble() * 170 - 85))
    val got = pts.toDF("lon", "lat")
      .select(QuadKeyFunctions.quadKey(s, col("lon"), col("lat"), 14).as("k14"),
        QuadKeyFunctions.quadKey(s, col("lon"), col("lat"), 10).as("k10"))
      .as[(Long, Long)].collect()
    pts.zip(got).foreach { case ((lon, lat), (k14, k10)) =>
      assert(k14 === Slippy.worldToQuadKey(lon, lat, 14))
      // the z10 cell computed independently IS the z14 cell's ancestor
      assert(Slippy.quadKeyParent(k14, 10) === k10)
      assert(Slippy.quadKeyContains(k10, k14))
    }
    // SQL registration + null propagation + codegen (no UDF)
    QuadKeyFunctions.register(s)
    val row = s.sql("SELECT quad_key(4.3517d, 50.8503d, 14) AS c, quad_key(CAST(NULL AS DOUBLE), 1.0d, 14) AS n")
      .collect().head
    assert(row.getLong(0) === Slippy.worldToQuadKey(4.3517, 50.8503, 14))
    assert(row.isNullAt(1))
    val plan = Seq((4.35, 50.85)).toDF("lon", "lat")
      .select(QuadKeyFunctions.quadKey(s, col("lon"), col("lat"), 14))
      .queryExecution.executedPlan.toString
    assert(plan.contains("quad_key") && !plan.contains("ScalaUDF"), plan)
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
