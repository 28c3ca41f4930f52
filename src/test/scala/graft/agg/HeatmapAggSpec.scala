package graft.agg

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.model.Schemas.{PixelVisit, Track}
import graft.raster.Rasterize
import graft.synth.{ImageSynth, TraceSynth}

/** Salted == unsalted == cascade: all three k-anonymity plans are exact. */
class HeatmapAggSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = graft.spark.Sessions.local(4, "agg-spec")

  private def raster(implicit s: SparkSession) = {
    import s.implicits._
    val tracks = s.createDataset((0L until 250L).map { i =>
      val ph = ImageSynth.phashOf(i)
      Track(i, TraceSynth.userOf(ph, 8), TraceSynth.trace(ph))
    })
    Rasterize.pixelKeys(tracks)
  }

  test("salted two-phase k-anonymity == fused count-distinct plan") {
    implicit val s: SparkSession = spark
    val fused = HeatmapAgg.globalGrainFused(raster).collect()
      .map(p => ((p.gx, p.gy), (p.users, p.trips))).toMap
    val salted = HeatmapAgg.globalGrainSalted(raster, salts = 7).collect()
      .map(p => ((p.gx, p.gy), (p.users, p.trips))).toMap
    assert(fused.nonEmpty)
    assert(salted === fused)
  }

  test("native TypedImperativeAggregate plan == fused count-distinct plan") {
    implicit val s: SparkSession = spark
    val fused = HeatmapAgg.globalGrainFused(raster).collect()
      .map(p => ((p.gx, p.gy), (p.users, p.trips))).toMap
    val native = HeatmapAgg.globalGrainNative(raster).collect()
      .map(p => ((p.gx, p.gy), (p.users, p.trips))).toMap
    assert(fused.nonEmpty)
    assert(native === fused)
  }

  test("native aggregate handles user_id 0 and null-free paths correctly") {
    implicit val s: SparkSession = spark
    import s.implicits._
    // user 0 exercises the open-hash set's zero-sentinel slot
    val visits = Seq(
      graft.model.Schemas.PixelVisit(0L, 42L, 1L),
      graft.model.Schemas.PixelVisit(0L, 42L, 2L),
      graft.model.Schemas.PixelVisit(1L, 42L, 3L),
      graft.model.Schemas.PixelVisit(2L, 42L, 4L),
      graft.model.Schemas.PixelVisit(0L, 99L, 7L))
    val got = HeatmapAgg.globalGrainNative(s.createDataset(visits), k = 1).collect()
      .map(p => (((p.gx << 32) | p.gy), (p.users, p.trips))).toMap
    assert(got(42L) === ((3L, 10L)))
    assert(got(99L) === ((1L, 7L)))
  }

  test("explicit user-grain cascade == fused plan") {
    implicit val s: SparkSession = spark
    import s.implicits._
    val up = HeatmapAgg.userGrain(raster.map(v =>
      graft.model.Schemas.UserPixel(v.user_id, v.pkey >>> 32, v.pkey & 0xFFFFFFFFL, v.trips)))
    val cascade = HeatmapAgg.globalGrain(up).collect()
      .map(p => ((p.gx, p.gy), (p.users, p.trips))).toMap
    val fused = HeatmapAgg.globalGrainFused(raster).collect()
      .map(p => ((p.gx, p.gy), (p.users, p.trips))).toMap
    assert(cascade === fused)
  }

  test("tile-users inverted index: sorted distinct users per touched tile") {
    implicit val s: SparkSession = spark
    import s.implicits._
    val idx = HeatmapAgg.tileUsersIndex(raster).collect()
    assert(idx.nonEmpty)
    val naive = raster.collect()
      .groupBy(v => ((v.pkey >>> 32) / 512, (v.pkey & 0xFFFFFFFFL) / 512))
      .view.mapValues(_.map(_.user_id).distinct.sorted.toSeq).toMap
    idx.foreach { r =>
      val key = (r.getAs[Long]("tx"), r.getAs[Long]("ty"))
      assert(r.getAs[Seq[Long]]("users") === naive(key))
    }
    assert(idx.length === naive.size)
  }
}
