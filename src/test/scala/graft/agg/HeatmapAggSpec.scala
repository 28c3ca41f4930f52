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

  test("tile-grain TileUsersAgg plan == fused count-distinct plan (the flagship path)") {
    implicit val s: SparkSession = spark
    import s.implicits._
    val tracks = s.createDataset((0L until 250L).map { i =>
      val ph = ImageSynth.phashOf(i)
      Track(i, TraceSynth.userOf(ph, 8), TraceSynth.trace(ph))
    })
    val fused = HeatmapAgg.globalGrainFused(Rasterize.pixelKeys(tracks)).collect()
      .map(p => ((p.z, p.gx, p.gy), (p.users, p.trips))).toMap
    val tiled = HeatmapAgg.globalGrainTiled(Rasterize.tileVisits(tracks)).collect()
      .map(p => ((p.z, p.gx, p.gy), (p.users, p.trips))).toMap
    assert(fused.nonEmpty)
    assert(tiled === fused)
  }

  test("hot-tile guard: striped tile agg == unstriped, buffer peak bounded by 1/stripes") {
    implicit val s: SparkSession = spark
    import s.implicits._
    // pathological regime: ONE z14 tile, 50k distinct users, ~24 pixels each
    // — the single-buffer worst case the guard exists for
    val users = 50000L
    val tkey = (8374L << 32) | 5556L
    val visits = s.range(users).map { u =>
      val pixels = Array.tabulate(24) { j =>
        val pix = ((u * 37 + j * 11) % (512L * 512L))
        (pix << 32) | 1L
      }
      graft.model.Schemas.TileVisit(u, tkey, pixels)
    }.repartition(8)
    visits.persist()

    graft.functions.TileBuffer.resetPeak()
    val unstriped = HeatmapAgg.tileCells(visits).collect()
    val peakUnstriped = graft.functions.TileBuffer.PeakPairs.get()

    graft.functions.TileBuffer.resetPeak()
    val striped = HeatmapAgg.tileCellsStriped(visits, stripes = 16).collect()
    val peakStriped = graft.functions.TileBuffer.PeakPairs.get()
    visits.unpersist()

    // exactness: identical cells (distinct users + trips per pixel)
    assert(unstriped.length === 1 && striped.length === 1)
    val uc = unstriped.head.cells.map(c => (c.pix, c.users, c.trips)).toSeq
    val sc = striped.head.cells.map(c => (c.pix, c.users, c.trips)).toSeq
    assert(uc.nonEmpty && sc === uc)
    // the guard's whole point: no single buffer holds the whole tile's
    // pairs any more (map-side partials make the unstriped peak the FULL
    // reduce-side union ≈ 1.2M pairs; striped peaks at ≈ pairs/16)
    assert(peakUnstriped > users * 10, s"unstriped peak $peakUnstriped")
    assert(peakStriped * 4 < peakUnstriped,
      s"striping did not bound the buffer: striped=$peakStriped unstriped=$peakUnstriped")
    // size-trigger heuristic engages striping exactly when needed
    assert(HeatmapAgg.stripesFor(1000) === 1)
    assert(HeatmapAgg.stripesFor(1000000) === 5)
    assert(HeatmapAgg.stripesFor(Long.MaxValue / 2) === 64)
  }

  test("TileBuffer kernel: dedup, merge, zero user id, serialization round-trip") {
    val a = new graft.functions.TileBuffer()
    a.addRow(0L, Array((7L << 32) | 3L, (9L << 32) | 1L)) // user 0: pix 7 (+3), pix 9 (+1)
    a.addRow(1L, Array((7L << 32) | 2L))                  // user 1: pix 7 (+2)
    a.addRow(0L, Array((7L << 32) | 5L))                  // user 0 again: no new distinct
    val b = new graft.functions.TileBuffer()
    b.addRow(2L, Array((7L << 32) | 1L, (11L << 32) | 4L))
    val ser = graft.functions.TileBuffer.deserialize(b.serialize())
    a.mergeFrom(ser)
    val cells = a.cells().map(c => c._1 -> ((c._2, c._3))).toMap
    assert(cells === Map(7 -> ((3L, 11L)), 9 -> ((1L, 1L)), 11 -> ((1L, 4L))))
    // sorted by pix
    assert(a.cells().map(_._1).toSeq === Seq(7, 9, 11))
  }

  test("tileVisits: packed runs reproduce pixelKeys exactly") {
    implicit val s: SparkSession = spark
    import s.implicits._
    val tracks = s.createDataset((0L until 50L).map { i =>
      val ph = ImageSynth.phashOf(i)
      Track(i, TraceSynth.userOf(ph, 8), TraceSynth.trace(ph))
    })
    val res = Rasterize.Resolution
    val fromTiles = Rasterize.tileVisits(tracks).collect()
      .flatMap { tv =>
        val tx = tv.tkey >>> 32; val ty = tv.tkey & 0xFFFFFFFFL
        tv.pixels.map { p =>
          val pix = p >>> 32; val trips = p & 0xFFFFFFFFL
          ((tv.user_id, tx * res + pix / res, ty * res + pix % res), trips)
        }
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val fromPixels = Rasterize.pixelKeys(tracks).collect()
      .map(v => ((v.user_id, v.pkey >>> 32, v.pkey & 0xFFFFFFFFL), v.trips))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(fromPixels.nonEmpty)
    assert(fromTiles === fromPixels)
  }

  test("library-default 1024-px resolution (HeatMap.cs:23): tiled == fused, nothing baked to 512") {
    implicit val s: SparkSession = spark
    import s.implicits._
    val tracks = s.createDataset((0L until 150L).map { i =>
      val ph = ImageSynth.phashOf(i)
      Track(i, TraceSynth.userOf(ph, 8), TraceSynth.trace(ph))
    })
    val res = 1024
    val fused = HeatmapAgg.globalGrainFused(Rasterize.pixelKeys(tracks, resolution = res)).collect()
      .map(p => ((p.gx, p.gy), (p.users, p.trips))).toMap
    val tiled = HeatmapAgg.globalGrainTiled(
        Rasterize.tileVisits(tracks, resolution = res), resolution = res).collect()
      .map(p => ((p.gx, p.gy), (p.users, p.trips))).toMap
    assert(fused.nonEmpty)
    assert(tiled === fused)
    // 1024-grain coordinates really are finer: twice the 512-grain extent
    assert(fused.keys.map(_._1).max > 512L * 8390)
    // and the pyramid rollup holds at 1024 too (local rollup vs explode)
    val z14 = HeatmapAgg.globalGrainTiled(
      Rasterize.tileVisits(tracks, resolution = res), resolution = res)
    val viaTiles = z14.toDF().unionByName(
      Pyramid.lowerLevelsFromTiles(HeatmapAgg.tileCells(
        Rasterize.tileVisits(tracks, resolution = res)), HeatmapAgg.KAnonymity,
        resolution = res).toDF())
      .collect().map(r => ((r.getInt(0), r.getLong(1), r.getLong(2)), (r.getLong(3), r.getLong(4)))).toMap
    val viaExplode = Pyramid.allLevels(z14).collect()
      .map(p => ((p.z, p.gx, p.gy), (p.users, p.trips))).toMap
    assert(viaTiles === viaExplode)
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

  test("TileUsersAgg randomized differential vs in-memory oracle (grow + serde + merge paths)") {
    implicit val s: SparkSession = spark
    import s.implicits._
    val rnd = new java.util.Random(99)
    val tkeys = Array((10L << 32) | 20L, (10L << 32) | 21L, (999L << 32) | 999L)
    val rows = (0 until 3000).map { _ =>
      val user = rnd.nextInt(40).toLong // includes user 0
      val tkey = tkeys(rnd.nextInt(tkeys.length))
      val n = 1 + rnd.nextInt(20)
      val pixels = Array.fill(n) {
        val pix = rnd.nextInt(512 * 512).toLong
        val trips = (1 + rnd.nextInt(3)).toLong
        (pix << 32) | trips
      }
      graft.model.Schemas.TileVisit(user, tkey, pixels)
    }
    // oracle: plain maps
    val trips = scala.collection.mutable.Map.empty[(Long, Long), Long]
    val users = scala.collection.mutable.Map.empty[(Long, Long), Set[Long]]
    rows.foreach { tv =>
      tv.pixels.foreach { p =>
        val key = (tv.tkey, p >>> 32)
        trips(key) = trips.getOrElse(key, 0L) + (p & 0xFFFFFFFFL)
        users(key) = users.getOrElse(key, Set.empty) + tv.user_id
      }
    }
    // 7 partitions force partial buffers + serde + cross-partition merges
    val got = HeatmapAgg.cellsToPixels(
        HeatmapAgg.tileCells(s.createDataset(rows).repartition(7)), k = 1)
      .collect()
      .map { p =>
        val tkey = ((p.gx / 512) << 32) | (p.gy / 512)
        val pix = (p.gx % 512) * 512 + (p.gy % 512)
        ((tkey, pix), (p.users, p.trips))
      }.toMap
    assert(got.size === trips.size)
    trips.foreach { case (key, t) =>
      assert(got(key) === ((users(key).size.toLong, t)), s"cell $key")
    }
  }

  test("custom aggregates reject wrong-typed SQL at analysis time, not mid-job") {
    implicit val s: SparkSession = spark
    graft.functions.TileUsersFunctions.register(s)
    graft.functions.UserTripsFunctions.register(s)
    intercept[org.apache.spark.sql.AnalysisException] {
      s.sql("SELECT tile_users(CAST(1 AS INT), array(1L, 2L))").collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      s.sql("SELECT user_trips('not a user', 1L)").collect()
    }
    // and the correctly-typed forms still analyze + run
    assert(s.sql("SELECT user_trips(1L, 2L) AS ut").collect().nonEmpty)
    assert(s.sql("SELECT tile_users(1L, array(4294967296L))").collect().nonEmpty)
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
