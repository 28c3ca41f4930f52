package graft.core

import org.scalatest.funsuite.AnyFunSuite

/**
 * Coordinate-kernel properties (SURVEY.md §5.3): the exact-match risk zone.
 * Golden values computed from the reference formulas
 * (`/root/reference/src/HeatMap.Tiles/TileStatic.cs`).
 */
class SlippySpec extends AnyFunSuite {
  private val rnd = new java.util.Random(42)
  private def randLon() = rnd.nextDouble() * 360.0 - 180.0
  private def randLat() = rnd.nextDouble() * 170.0 - 85.0 // Mercator-safe

  test("toLocalId/toTile are inverse (TileStatic.cs:9-25)") {
    (1 to 5000).foreach { _ =>
      val z = 1 + rnd.nextInt(14)
      val x = (rnd.nextDouble() * (1L << z)).toLong
      val y = (rnd.nextDouble() * (1L << z)).toLong
      assert(Slippy.toTile(z, Slippy.toLocalId(x, y, z)) === ((x, y)))
    }
  }

  test("worldToTile golden values (slippy-map reference points)") {
    // lon=0, lat=0 at z=1 → tile (1, 1)
    assert(Slippy.worldToTile(0.0, 0.0, 1) === ((1L, 1L)))
    // Brussels (4.3517, 50.8503) at z=14 → known slippy tile
    val (bx, by) = Slippy.worldToTile(4.3517, 50.8503, 14)
    assert(bx === ((4.3517 + 180.0) / 360.0 * 16384).toLong)
    // y from the Mercator formula, truncated
    val rad = (50.8503 / 180d) * math.Pi
    val yExpect = (((1.0 - math.log(math.tan(rad) + 1.0 / math.cos(rad)) / math.Pi) / 2.0) * 16384).toLong
    assert(by === yExpect)
  }

  test("worldToTile ∘ box containment: a point maps into a tile whose box contains it") {
    (1 to 2000).foreach { _ =>
      val z = 6 + rnd.nextInt(9)
      val lon = randLon(); val lat = randLat()
      val (tx, ty) = Slippy.worldToTile(lon, lat, z)
      val (left, top, right, bottom) = Slippy.boxXY(z, tx, ty)
      assert(lon >= left - 1e-9 && lon <= right + 1e-9, s"lon $lon not in [$left,$right] z=$z")
      assert(lat <= top + 1e-9 && lat >= bottom - 1e-9, s"lat $lat not in [$bottom,$top] z=$z")
    }
  }

  test("to/fromLocalTileCoordinates round-trip within one pixel") {
    (1 to 2000).foreach { _ =>
      val z = 10 + rnd.nextInt(5)
      val res = 512
      val lon = randLon(); val lat = randLat()
      val (px, py, tid) = Slippy.toLocalTileCoordinatesWithTile(z, lon, lat, res)
      val (lon2, lat2) = Slippy.fromLocalTileCoordinates(z, tid, px, py, res)
      val (left, top, right, bottom) = Slippy.box(z, tid)
      val lonStep = (right - left) / res
      val latStep = (top - bottom) / res
      assert(math.abs(lon2 - lon) <= lonStep * 1.0001)
      assert(math.abs(lat2 - lat) <= latStep * 1.0001)
    }
  }

  test("parentTileFor/subTilesFor are inverse (TileStatic.cs:184-225)") {
    (1 to 1000).foreach { _ =>
      val z = 2 + rnd.nextInt(12)
      val x = (rnd.nextDouble() * (1L << z)).toLong
      val y = (rnd.nextDouble() * (1L << z)).toLong
      val pz = rnd.nextInt(z)
      val (px, py) = Slippy.parentTileFor(x, y, z, pz)
      assert(Slippy.subTilesFor(px, py, pz, z).contains((x, y)))
    }
  }

  test("subTilesFor yields 4^dz children, all mapping back to the parent") {
    val children = Slippy.subTilesFor(3, 5, 4, 6).toSeq
    assert(children.size === 16)
    children.foreach { case (cx, cy) =>
      assert(Slippy.parentTileFor(cx, cy, 6, 4) === ((3L, 5L)))
    }
  }

  test("toHeatMapCoordinates matches manual composition (HeatMapDiffExtensions.cs:14-24)") {
    (1 to 2000).foreach { _ =>
      val lon = randLon(); val lat = randLat()
      val z = 14; val res = 512
      val got = Slippy.toHeatMapCoordinates(z, res, lon, lat).get
      val (px, py, tid) = Slippy.toLocalTileCoordinatesWithTile(z, lon, lat, res)
      val (tx, ty) = Slippy.toTile(z, tid)
      assert(got === ((tx * res + px, ty * res + py)))
    }
  }

  test("parent global pixel = child >> 1 (the pyramid collapse, HeatMapExtensions.cs:195-209)") {
    // parent-tile quadrant math: left + lx/2 where left = (res/2)*(tx%2)
    val res = 512
    (1 to 5000).foreach { _ =>
      val tx = (rnd.nextDouble() * 16384).toLong
      val lx = rnd.nextInt(res)
      val gx = tx * res + lx
      val parentTx = tx / 2
      val left = (res / 2) * (tx % 2)
      val parentGx = parentTx * res + left + lx / 2
      assert(parentGx === (gx >> 1))
    }
  }

  test("tile-inclusion rejection returns None → rasterizer bridges (F4)") {
    assert(Slippy.toHeatMapCoordinates(14, 512, 4.35, 50.85, _ => false).isEmpty)
  }

  test("maxLocalId keeps the reference's xMax²+xMax quirk (TileStatic.cs:26-30)") {
    assert(Slippy.maxLocalId(0) === 2L)       // 1 + 1
    assert(Slippy.maxLocalId(1) === 6L)       // 4 + 2
    assert(Slippy.maxLocalId(14) === (1L << 28) + (1L << 14))
    // every real tile id is strictly below the bound
    assert(Slippy.toLocalId((1L << 14) - 1, (1L << 14) - 1, 14) < Slippy.maxLocalId(14))
  }

  test("subCoordinates: fractional tile coords, y fraction bottom-up (TileStatic.cs:48-63)") {
    val (tx, ty) = (8374L, 5556L)
    val tid = Slippy.toLocalId(tx, ty, 14)
    val (left, top, right, bottom) = Slippy.box(14, tid)
    // tile corners: left/bottom → (x + 0, y + 0); right/top → (x+1, y+1)
    val (x0, y0) = Slippy.subCoordinates(14, tid, left, bottom)
    assert(math.abs(x0 - tx) < 1e-9 && math.abs(y0 - ty) < 1e-9)
    val (x1, y1) = Slippy.subCoordinates(14, tid, right, top)
    assert(math.abs(x1 - (tx + 1)) < 1e-9 && math.abs(y1 - (ty + 1)) < 1e-9)
    // midpoint lands at +0.5 in x
    val (xm, _) = Slippy.subCoordinates(14, tid, (left + right) / 2, bottom)
    assert(math.abs(xm - (tx + 0.5)) < 1e-9)
  }

  test("isDirectNeighbour: 4-connectivity only (TileStatic.cs:64-83)") {
    def id(x: Long, y: Long) = Slippy.toLocalId(x, y, 14)
    assert(Slippy.isDirectNeighbour(14, id(10, 10), id(10, 11)))
    assert(Slippy.isDirectNeighbour(14, id(10, 10), id(9, 10)))
    assert(!Slippy.isDirectNeighbour(14, id(10, 10), id(11, 11)), "diagonal")
    assert(!Slippy.isDirectNeighbour(14, id(10, 10), id(10, 10)), "self")
    assert(!Slippy.isDirectNeighbour(14, id(10, 10), id(10, 12)), "distance 2")
  }

  test("quadkey: round-trip, prefix-parent property, containment (seeded)") {
    val rnd = new java.util.Random(41)
    (1 to 500).foreach { _ =>
      val z = 1 + rnd.nextInt(14)
      val x = rnd.nextLong(1L << z).abs % (1L << z)
      val y = rnd.nextLong(1L << z).abs % (1L << z)
      val k = Slippy.quadKey(x, y, z)
      assert(Slippy.fromQuadKey(k) === ((x, y, z)))
      // parent via quadkey == parent via coordinates, at every ancestor zoom
      val pz = rnd.nextInt(z)
      val viaKey = Slippy.fromQuadKey(Slippy.quadKeyParent(k, pz))
      val (px, py) = Slippy.parentTileFor(x, y, z, pz)
      assert(viaKey === ((px, py, pz)))
      assert(Slippy.quadKeyContains(Slippy.quadKey(px, py, pz), k))
      // a sibling subtree never contains it
      val sibX = px ^ 1L
      if (pz > 0) assert(!Slippy.quadKeyContains(Slippy.quadKey(sibX, py, pz), k))
    }
    // descendants of one parent form a contiguous quadkey range (the
    // min-max-prunable subtree-scan property)
    val parent = Slippy.quadKey(2, 3, 2)
    val kids = Slippy.subTilesFor(2, 3, 2, 5).map { case (cx, cy) =>
      Slippy.quadKey(cx, cy, 5) }.toSeq.sorted
    assert(kids.size === 64)
    val lo = ((parent >>> 5) << (2 * 3) << 5) | 5
    val hi = (((parent >>> 5) + 1) << (2 * 3) << 5) | 5
    assert(kids.head >= lo && kids.last < hi)
    assert(kids.forall(k => Slippy.quadKeyContains(parent, k)))
    // zoom bounds are validated (zoom 30+ would overflow the Long packing;
    // negative zoom is meaningless) instead of silently producing garbage
    intercept[IllegalArgumentException](Slippy.quadKey(0, 0, 30))
    intercept[IllegalArgumentException](Slippy.quadKey(0, 0, -1))
    assert(Slippy.fromQuadKey(Slippy.quadKey((1L << 29) - 1, 0, 29)) === (((1L << 29) - 1, 0L, 29)))
  }

  test("toPolygon adds a 5% margin around the tile box (TileStatic.cs:235-268)") {
    val tid = Slippy.toLocalId(8374, 5556, 14)
    val ring = Slippy.toPolygon(14, tid)
    val (left, top, right, bottom) = Slippy.box(14, tid)
    assert(ring.length === 5)
    assert(ring(0)._1 < left && ring(1)._1 > right)
    assert(ring(0)._2 > top && ring(2)._2 < bottom)
    assert(ring(0) === ring(4))
  }
}
