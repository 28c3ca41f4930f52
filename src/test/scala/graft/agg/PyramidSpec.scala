package graft.agg

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.model.Schemas.GlobalPixel

/** The single-shuffle ancestor-explode pyramid must equal the iterative
  * 14-step 2×2 rollup cascade exactly. */
class PyramidSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = graft.spark.Sessions.local(4, "pyramid-spec")

  test("exploded pyramid == iterative pyramid on seeded random pixels") {
    implicit val s: SparkSession = spark
    import s.implicits._
    val rnd = new java.util.Random(99)
    val pixels = (1 to 20000).map { _ =>
      GlobalPixel(14, (rnd.nextDouble() * (16384L * 512)).toLong,
        (rnd.nextDouble() * (16384L * 512)).toLong,
        1 + rnd.nextInt(5), 1 + rnd.nextInt(100))
    }
    val z14 = s.createDataset(pixels)
      .groupBy($"z", $"gx", $"gy")
      .agg(org.apache.spark.sql.functions.sum($"users").as("users"),
        org.apache.spark.sql.functions.sum($"trips").as("trips"))
      .as[GlobalPixel]
    val a = Pyramid.allLevels(z14).collect()
      .map(p => ((p.z, p.gx, p.gy), (p.users, p.trips))).toMap
    val b = Pyramid.allLevelsIterative(z14).collect()
      .map(p => ((p.z, p.gx, p.gy), (p.users, p.trips))).toMap
    assert(a.size === b.size)
    assert(a === b)
  }
}
