package graft

import scala.collection.mutable

import graft.core.{Bresenham, Slippy}
import graft.model.Schemas.Track

/**
 * Executable-spec oracle (SURVEY.md §5.2): a tiny single-threaded,
 * dense-map reimplementation of the reference algorithm
 * (`Worker.UpdateHeatMap` + `ApplyDiff` + `RebuildParentTileTree` semantics)
 * used to golden-check the distributed pipeline. Deliberately written in
 * the most obvious imperative style — different code shape from the Spark
 * engine so bugs don't correlate.
 *
 * Note it applies the *intended* merge semantics (`new = old + value`), not
 * the reference's leaf-branch double-add bug
 * (Diffs/HeatMapExtensions.cs:72-76) — see SURVEY.md §2.4 bug note; for the
 * single-batch scenarios tested here the two are identical anyway.
 */
object SpecOracle {
  type Pix = (Long, Long)

  /** user → pixel → trips (A2/A3). */
  def userHeatmaps(tracks: Seq[Track], zoom: Int, res: Int): Map[Long, Map[Pix, Long]] = {
    val byUser = mutable.Map.empty[Long, mutable.Map[Pix, Long]]
    tracks.foreach { t =>
      val m = byUser.getOrElseUpdate(t.user_id, mutable.Map.empty)
      if (t.coords.nonEmpty) {
        var prev: Option[Pix] = Slippy.toHeatMapCoordinates(zoom, res, t.coords(0)(0), t.coords(0)(1))
        (1 until t.coords.length).foreach { c =>
          val cur = Slippy.toHeatMapCoordinates(zoom, res, t.coords(c)(0), t.coords(c)(1))
          cur.foreach { cc =>
            prev.foreach { pp =>
              Bresenham.foreachPixel(pp._1, pp._2, cc._1, cc._2) { (x, y) =>
                if (x >= 0 && y >= 0) m((x, y)) = m.getOrElse((x, y), 0L) + 1L
              }
            }
            prev = cur
          }
        }
      }
    }
    byUser.view.mapValues(_.toMap).toMap
  }

  /** global z14: pixel → (users, trips), k-anonymity applied (A4/A5/F7). */
  def globalZ14(users: Map[Long, Map[Pix, Long]], k: Int): Map[Pix, (Long, Long)] = {
    val acc = mutable.Map.empty[Pix, (Long, Long)]
    users.values.foreach { m =>
      m.foreach { case (p, trips) =>
        val (u, tr) = acc.getOrElse(p, (0L, 0L))
        acc(p) = (u + 1, tr + trips)
      }
    }
    acc.filter(_._2._1 >= k).toMap
  }

  /** pyramid: z → pixel → (users, trips); parent = sum of (gx>>1, gy>>1) groups (A6-A8). */
  def pyramid(z14: Map[Pix, (Long, Long)], maxZoom: Int = 14, minZoom: Int = 0): Map[Int, Map[Pix, (Long, Long)]] = {
    val out = mutable.Map(maxZoom -> z14)
    var cur = z14
    var z = maxZoom
    while (z > minZoom) {
      val next = mutable.Map.empty[Pix, (Long, Long)]
      cur.foreach { case ((gx, gy), (u, t)) =>
        val key = (gx >> 1, gy >> 1)
        val (pu, pt) = next.getOrElse(key, (0L, 0L))
        next(key) = (pu + u, pt + t)
      }
      z -= 1
      cur = next.toMap
      out(z) = cur
    }
    out.toMap
  }
}
