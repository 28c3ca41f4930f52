package graft.geo

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.geo.SpatialJoins.Region

/**
 * Distributed spatial joins vs naive in-memory oracles: the cell-cover PIP
 * join and the cell-ring kNN must equal brute-force semantics exactly.
 */
class SpatialJoinsSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = graft.spark.Sessions.local(4, "spatial-spec")

  private val regions = Seq(
    Region(1, 4.30, 50.80, 4.40, 50.90),
    Region(2, 4.38, 50.88, 4.52, 51.00), // overlaps region 1
    Region(3, 3.00, 49.00, 3.01, 49.01)) // empty region

  private def points(n: Int): Seq[(Long, Double, Double)] = {
    val rnd = new java.util.Random(31)
    (1 to n).map { i =>
      (i.toLong, 4.25 + rnd.nextDouble() * 0.35, 50.75 + rnd.nextDouble() * 0.35)
    }
  }

  test("cell-cover PIP join == naive containment filter, overlaps included") {
    implicit val s: SparkSession = spark
    import s.implicits._
    val pts = points(4000)
    val df = pts.toDF("pid", "lon", "lat")
    val got = SpatialJoins.pointInRegion(df, regions)
      .select("pid", "region_id").as[(Long, Long)].collect().toSet
    val want = (for {
      (pid, lon, lat) <- pts
      r <- regions
      if lon >= r.left && lon <= r.right && lat >= r.bottom && lat <= r.top
    } yield (pid, r.region_id)).toSet
    assert(got === want)
    assert(want.nonEmpty)
    // a point inside both overlapping regions appears twice
    assert(want.groupBy(_._1).values.exists(_.size == 2))
  }

  test("cell-ring kNN == brute-force kNN when the ring covers the neighbors") {
    implicit val s: SparkSession = spark
    import s.implicits._
    val pts = points(2000)
    val df = pts.toDF("pid", "lon", "lat")
    val qs = Seq((1L, 4.35, 50.85), (2L, 4.45, 50.95))
    val brute = SpatialJoins.knnBruteForce(df, qs, 10)
      .as[(Long, Int, Long)].collect().toSet
    val ring = SpatialJoins.knnCellRing(df, qs, 10, ring = 40)
      .select("qid", "rn", "pid").as[(Long, Int, Long)].collect().toSet
    assert(brute === ring)
    assert(brute.size === 20)
  }

  test("adaptive-ring exact kNN == brute force, including sparse far-away queries") {
    implicit val s: SparkSession = spark
    import s.implicits._
    val pts = points(3000)
    val df = pts.toDF("pid", "lon", "lat")
    // one query inside the cloud, one at its edge, one far outside (forces
    // several ring doublings before the coverage proof holds)
    val qs = Seq((1L, 4.40, 50.90), (2L, 4.25, 50.75), (3L, 4.9, 51.3))
    val brute = SpatialJoins.knnBruteForce(df, qs, 7).as[(Long, Int, Long)].collect().toSet
    val exact = SpatialJoins.knnExact(df, qs, 7).as[(Long, Int, Long)].collect().toSet
    assert(exact === brute)
    assert(exact.size === 21)
  }

  test("raster-vector overlay is an exact pixel equi-join") {
    implicit val s: SparkSession = spark
    import s.implicits._
    val heat = Seq((1L, 2L, 10L), (3L, 4L, 20L), (5L, 6L, 30L)).toDF("gx", "gy", "trips")
    val trace = Seq((1L, 2L), (5L, 6L), (9L, 9L)).toDF("gx", "gy")
    val got = SpatialJoins.rasterVectorOverlay(heat, trace)
      .select("gx", "gy", "trips").as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 2L, 10L), (5L, 6L, 30L)))
  }

  test("cover cells contain every point's cell within the region") {
    val r = regions.head
    val cover = SpatialJoins.coverCells(r).map(_._2).toSet
    points(500).foreach { case (_, lon, lat) =>
      if (lon >= r.left && lon <= r.right && lat >= r.bottom && lat <= r.top) {
        assert(cover.contains(graft.core.Slippy.worldTileLocalId(lon, lat, SpatialJoins.CellZoom)))
      }
    }
  }
}
