package graft.tools

import org.apache.spark.sql.SparkSession

import graft.agg.HeatmapAgg
import graft.core.Slippy
import graft.model.Schemas.Track
import graft.pipeline.HeatmapPipeline

/**
 * End-to-end hot-tile guard probe: drives the FLAGSHIP pipeline (not the
 * aggregate in isolation) over a pathological corpus — every track of
 * `users` distinct users confined to ONE z14 tile — once through the
 * plain path (stripes = 1) and once through `runAuto`, which must
 * estimate the user cardinality, engage `tileCellsStriped`, and bound
 * the per-reducer tile buffer. Records `TileBuffer.PeakPairs` (the
 * high-water mark of any single tile buffer's (pixel, user) pairs) for
 * both runs plus output equality. Results land in BENCH/BASELINE.md.
 *
 *   sbt "runMain graft.tools.HotTileProbe [users] [cpus]"
 */
object HotTileProbe {
  def main(args: Array[String]): Unit = {
    val users = args.headOption.map(_.toLong).getOrElse(450000L)
    val cpus = args.lift(1).map(_.toInt).getOrElse(8)
    implicit val s: SparkSession = graft.spark.Sessions.local(cpus, "hot-tile-probe")
    import s.implicits._

    // one z14 tile around Brussels; tracks sample points strictly inside
    val zoom = graft.raster.Rasterize.Zoom
    val (tx, ty) = Slippy.worldToTile(4.4, 51.0, zoom)
    val (lonW, latN, lonE, latS) = Slippy.boxXY(zoom, tx, ty)
    val (cx, cy) = ((lonW + lonE) / 2, (latN + latS) / 2)
    val (sx, sy) = ((lonE - lonW) / 4, (latS - latN) / 4)
    val tracks = s.range(0, users, 1, cpus * 4).map { u =>
      val pts = Array.tabulate(6) { j =>
        val h1 = graft.synth.TraceSynth.mix64(u * 31 + j)
        val h2 = graft.synth.TraceSynth.mix64(u * 131 + j * 7 + 1)
        Array(cx + (h1 >>> 11).toDouble / (1L << 53).toDouble * sx,
          cy + (h2 >>> 11).toDouble / (1L << 53).toDouble * sy)
      }
      Track(u, u, pts) // one track per user: `users` DISTINCT users on one tile
    }
    tracks.persist().count()

    def fingerprint(r: HeatmapPipeline.HeatmapResult): (Long, Long) = {
      import org.apache.spark.sql.functions._
      val row = r.z14.toDF()
        .agg(count(lit(1)), sum(hash(col("gx"), col("gy"), col("users"), col("trips")).cast("long")))
        .head()
      (row.getLong(0), row.getLong(1))
    }
    def run(label: String)(body: => HeatmapPipeline.HeatmapResult): (Long, Long, Long, Double) = {
      graft.functions.TileBuffer.resetPeak()
      val t0 = System.nanoTime()
      val r = body
      val (px, fp) = fingerprint(r)
      val secs = (System.nanoTime() - t0) / 1e9
      val peak = graft.functions.TileBuffer.PeakPairs.get()
      r.release()
      System.err.println(f"[hot-tile] $label%-9s pixels=$px peak_pairs=$peak sec=$secs%.2f")
      (px, fp, peak, secs)
    }

    // warm (JIT), then measure
    run("warm")(HeatmapPipeline.run(tracks, k = 1))
    val (px1, fp1, peakPlain, secPlain) = run("plain")(HeatmapPipeline.run(tracks, k = 1))
    val (px2, fp2, peakAuto, secAuto) = run("auto")(HeatmapPipeline.runAuto(tracks, k = 1))
    tracks.unpersist()

    val stripes = HeatmapAgg.stripesFor(users)
    require(px1 == px2 && fp1 == fp2, s"striping changed the output: ($px1,$fp1) vs ($px2,$fp2)")
    println(
      s"""{"probe":"hot_tile","users":$users,"auto_stripes":$stripes,"z14_pixels":$px1,""" +
      s""""peak_pairs_plain":$peakPlain,"peak_pairs_auto":$peakAuto,""" +
      s""""peak_ratio":${math.rint(peakPlain.toDouble / peakAuto * 100) / 100.0},""" +
      s""""sec_plain":${math.rint(secPlain * 100) / 100.0},"sec_auto":${math.rint(secAuto * 100) / 100.0},""" +
      s""""output_identical":true}""")
    s.stop()
  }
}
