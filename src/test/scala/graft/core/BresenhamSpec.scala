package graft.core

import org.scalatest.funsuite.AnyFunSuite

/**
 * Bresenham properties (SURVEY.md §5.3): endpoint inclusion,
 * 8-connectivity, reversal set-symmetry, pixel count = max(|dx|,|dy|)+1 —
 * pinned against `/root/reference/src/HeatMap.Tiles/Draw/Bresenhams.cs:8-37`.
 */
class BresenhamSpec extends AnyFunSuite {
  private val rnd = new java.util.Random(1234)

  private def randSeg() = (
    rnd.nextInt(2000) - 1000L, rnd.nextInt(2000) - 1000L,
    rnd.nextInt(2000) - 1000L, rnd.nextInt(2000) - 1000L)

  test("both endpoints always drawn") {
    (1 to 2000).foreach { _ =>
      val (x0, y0, x1, y1) = randSeg()
      val px = Bresenham.pixels(x0, y0, x1, y1)
      assert(px.head === ((x0, y0)))
      assert(px.last === ((x1, y1)))
    }
  }

  test("pixel count = max(|dx|,|dy|) + 1, all pixels distinct") {
    (1 to 2000).foreach { _ =>
      val (x0, y0, x1, y1) = randSeg()
      val px = Bresenham.pixels(x0, y0, x1, y1)
      assert(px.length === Bresenham.pixelCount(x0, y0, x1, y1))
      assert(px.distinct.length === px.length)
    }
  }

  test("8-connectivity: consecutive pixels are chebyshev-1 apart") {
    (1 to 1000).foreach { _ =>
      val (x0, y0, x1, y1) = randSeg()
      val px = Bresenham.pixels(x0, y0, x1, y1)
      px.sliding(2).foreach {
        case Array((ax, ay), (bx, by)) =>
          assert(math.max(math.abs(bx - ax), math.abs(by - ay)) === 1L)
        case _ =>
      }
    }
  }

  test("degenerate segment draws exactly one pixel") {
    assert(Bresenham.pixels(5, 7, 5, 7).toSeq === Seq((5L, 7L)))
  }

  test("axis-aligned and diagonal goldens") {
    assert(Bresenham.pixels(0, 0, 3, 0).toSeq === Seq((0L, 0L), (1L, 0L), (2L, 0L), (3L, 0L)))
    assert(Bresenham.pixels(0, 0, 0, -3).toSeq === Seq((0L, 0L), (0L, -1L), (0L, -2L), (0L, -3L)))
    assert(Bresenham.pixels(0, 0, 3, 3).toSeq === Seq((0L, 0L), (1L, 1L), (2L, 2L), (3L, 3L)))
  }

  test("shallow-slope golden matches the reference's rounding (numerator = longest >> 1)") {
    // dx=5, dy=2: visits computed by hand-running Bresenhams.cs:8-37
    val got = Bresenham.pixels(0, 0, 5, 2).toSeq
    assert(got === Seq((0L, 0L), (1L, 0L), (2L, 1L), (3L, 1L), (4L, 2L), (5L, 2L)))
  }
}
