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

  test("ray-cast kernel: convex oracle (half-planes) + concave golden") {
    // seeded random convex polygons: containment independently decidable by
    // the half-plane test, so the ray caster has a true oracle
    val rnd = new java.util.Random(17)
    (1 to 20).foreach { _ =>
      val cx = 4.0 + rnd.nextDouble(); val cy = 50.5 + rnd.nextDouble()
      // vertices on a circle (sorted angles, fixed radius) are guaranteed
      // convex — a sound half-plane oracle (random radii would be merely
      // star-shaped, where the half-plane test is wrong)
      val angles = (0 until 3 + rnd.nextInt(5)).map(_ => rnd.nextDouble() * 2 * math.Pi).sorted
      val hull = angles.map(a => (cx + 0.15 * math.cos(a), cy + 0.15 * math.sin(a)))
      val ring = (hull :+ hull.head).map { case (x, y) => Array(x, y) }.toArray
      def halfPlaneInside(px: Double, py: Double): Boolean =
        (0 until hull.size).forall { i =>
          val (x1, y1) = hull(i); val (x2, y2) = hull((i + 1) % hull.size)
          (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1) >= 0
        }
      (1 to 60).foreach { _ =>
        val px = cx + 0.4 * (rnd.nextDouble() - 0.5)
        val py = cy + 0.4 * (rnd.nextDouble() - 0.5)
        // skip near-boundary points (tie-break conventions differ there)
        val strictIn = (0 until hull.size).forall { i =>
          val (x1, y1) = hull(i); val (x2, y2) = hull((i + 1) % hull.size)
          (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1) > 1e-9
        }
        val strictOut = (0 until hull.size).exists { i =>
          val (x1, y1) = hull(i); val (x2, y2) = hull((i + 1) % hull.size)
          (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1) < -1e-9
        }
        if (strictIn) assert(SpatialJoins.pointInRing(px, py, ring), s"($px,$py) should be in")
        else if (strictOut) assert(!SpatialJoins.pointInRing(px, py, ring), s"($px,$py) should be out")
      }
    }
    // concave L-shape golden
    val l = Array(Array(0.0, 0.0), Array(2.0, 0.0), Array(2.0, 1.0),
      Array(1.0, 1.0), Array(1.0, 2.0), Array(0.0, 2.0), Array(0.0, 0.0))
    assert(SpatialJoins.pointInRing(0.5, 0.5, l))
    assert(SpatialJoins.pointInRing(1.5, 0.5, l))
    assert(SpatialJoins.pointInRing(0.5, 1.5, l))
    assert(!SpatialJoins.pointInRing(1.5, 1.5, l), "the notch is outside")
    assert(!SpatialJoins.pointInRing(2.5, 0.5, l))
    // documented tie-break goldens: an edge the point lies ON never toggles
    // (strict lon < xCross), so left/bottom boundaries are inside (the
    // region lies strictly to the point's right / above) and right/top are
    // outside — adjacent regions sharing a border claim a point only once
    assert(SpatialJoins.pointInRing(0.0, 0.5, l), "exact left edge is inside")
    assert(!SpatialJoins.pointInRing(2.0, 0.5, l), "exact right edge is outside")
    assert(SpatialJoins.pointInRing(0.5, 0.0, l), "exact bottom edge is inside")
    assert(!SpatialJoins.pointInRing(0.5, 2.0, l), "exact top edge is outside")
  }

  test("pointInPolygon join == brute-force ray cast over all pairs") {
    implicit val s: SparkSession = spark
    import s.implicits._
    val pts = points(800)
    val df = pts.toDF("pid", "lon", "lat")
    val tri = SpatialJoins.PolyRegion(1, Array(
      Array(3.3, 50.3), Array(4.5, 50.4), Array(3.9, 51.2), Array(3.3, 50.3)))
    val lshape = SpatialJoins.PolyRegion(2, Array(
      Array(4.0, 50.1), Array(4.9, 50.1), Array(4.9, 50.6),
      Array(4.45, 50.6), Array(4.45, 51.3), Array(4.0, 51.3), Array(4.0, 50.1)))
    val got = SpatialJoins.pointInPolygon(df, Seq(tri, lshape))
      .select("pid", "region_id").as[(Long, Long)].collect().toSet
    val want = (for {
      (pid, lon, lat) <- pts
      r <- Seq(tri, lshape) if SpatialJoins.pointInRing(lon, lat, r.ring)
    } yield (pid, r.region_id)).toSet
    assert(want.nonEmpty, "fixture must hit both polygons")
    assert(got === want)
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
