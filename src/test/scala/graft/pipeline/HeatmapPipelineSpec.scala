package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SpecOracle
import graft.agg.HeatmapAgg
import graft.core.MvtCodec
import graft.model.Schemas._
import graft.synth.{ImageSynth, TraceSynth}

/**
 * Golden e2e test (SURVEY.md §5.2): the distributed pipeline must equal the
 * single-threaded executable-spec oracle on (a) pixel assignments,
 * (b) trip counts, (c) distinct-user counts, (d) k-anonymity filtering,
 * (e) all 15 zoom levels, (f) MVT feature payloads.
 */
class HeatmapPipelineSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = graft.spark.Sessions.local(4, "pipeline-spec")

  private val N = 300
  private lazy val testTracks: Seq[Track] = (0L until N).map { i =>
    val ph = ImageSynth.phashOf(i)
    Track(i, TraceSynth.userOf(ph, HeatmapPipeline.DefaultUsers), TraceSynth.trace(ph))
  }

  private lazy val oracleUsers = SpecOracle.userHeatmaps(testTracks, 14, 512)
  private lazy val oracleZ14 = SpecOracle.globalZ14(oracleUsers, HeatmapAgg.KAnonymity)
  private lazy val oraclePyr = SpecOracle.pyramid(oracleZ14)

  private lazy val result: HeatmapPipeline.HeatmapResult = {
    implicit val s: SparkSession = spark
    import s.implicits._
    HeatmapPipeline.run(s.createDataset(testTracks))
  }

  test("user-grain pixels match the oracle exactly") {
    val got = result.userPixels.collect()
      .map(p => ((p.user_id, p.gx, p.gy), p.trips)).toMap
    val want = oracleUsers.flatMap { case (u, m) =>
      m.map { case ((gx, gy), t) => ((u, gx, gy), t) }
    }
    assert(got.size === want.size)
    assert(got === want)
  }

  test("z14 global layer matches: users, trips, k-anonymity") {
    assert(oracleZ14.nonEmpty, "synthetic world must produce >=3-user pixels")
    val got = result.z14.collect().map(p => ((p.gx, p.gy), (p.users, p.trips))).toMap
    assert(got === oracleZ14)
    assert(got.valuesIterator.forall(_._1 >= HeatmapAgg.KAnonymity))
  }

  test("all 15 pyramid levels match the oracle") {
    val got = result.pyramid.collect()
      .groupBy(_.z)
      .view.mapValues(_.map(p => ((p.gx, p.gy), (p.users, p.trips))).toMap).toMap
    assert(got.keySet === (0 to 14).toSet)
    (0 to 14).foreach { z =>
      assert(got(z) === oraclePyr(z), s"zoom $z mismatch")
    }
  }

  test("tracksDirect equals the image-derived track path (graft consistency)") {
    implicit val s: SparkSession = spark
    import s.implicits._
    val direct = HeatmapPipeline.tracksDirect(20).collect().sortBy(_.contribution_id)
    val viaImages = HeatmapPipeline.tracks(HeatmapPipeline.images(20)).collect().sortBy(_.contribution_id)
    direct.zip(viaImages).foreach { case (a, b) =>
      assert(a.user_id === b.user_id)
      assert(a.coords.map(_.toSeq).toSeq === b.coords.map(_.toSeq).toSeq)
    }
  }

  test("MVT blobs decode back to the oracle's pixel payloads") {
    implicit val s: SparkSession = spark
    val tiles = HeatmapPipeline.mvt(result.z14).collect()
    assert(tiles.nonEmpty)
    val res = 512
    tiles.foreach { t =>
      val feats = MvtCodec.decodeTile(t.mvt)
      assert(feats.nonEmpty) // empty tiles must not be emitted (F6)
      feats.foreach { case (ex, ey, users, trips) =>
        // reference-stack placement: linear pixel→lon/lat then Mercator
        // quantization — both coords land sub-pixel off the linear grid;
        // recover the pixel by nearest-grid rounding
        val px = math.round(ex / 8.0)
        val py = math.round(ey / 8.0)
        assert(math.abs(ex - px * 8) <= 1)
        assert(math.abs(ey - py * 8) < 8, s"y not sub-pixel: $ey vs ${py * 8}")
        val gx = t.tx * res + px
        val gy = t.ty * res + py
        assert(oracleZ14.get((gx, gy)).contains((users, trips)),
          s"tile (${t.tx},${t.ty}) pixel ($gx,$gy)")
        // and the placement is EXACTLY the two-step reference transform
        assert((ex, ey) === {
          val (a, b) = graft.core.WebMercator.extentCoords(
            14, t.tx, t.ty, px.toInt, py.toInt, res, MvtCodec.Extent)
          (a, b)
        })
      }
    }
    // feature counts must cover every oracle pixel
    val totalFeats = tiles.map(t => MvtCodec.decodeTile(t.mvt).size).sum
    assert(totalFeats === oracleZ14.size)
  }

  test("mvtAll (narrow z14 from tile cells) is byte-equal to mvt(pyramid)") {
    implicit val s: SparkSession = spark
    val viaPyramid = HeatmapPipeline.mvt(result.pyramid).collect()
      .map(t => ((t.z, t.tx, t.ty), t.mvt.toSeq)).toMap
    val viaTiles = HeatmapPipeline.mvtAll(result).collect()
      .map(t => ((t.z, t.tx, t.ty), t.mvt.toSeq)).toMap
    assert(viaPyramid.nonEmpty)
    assert(viaTiles.keySet === viaPyramid.keySet)
    viaTiles.foreach { case (key, bytes) =>
      assert(bytes === viaPyramid(key), s"tile $key bytes differ")
    }
  }

  test("flat-array dump path (encodeZ14Flat + encodeLowerFused) is byte-equal to the object path") {
    implicit val s: SparkSession = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    val tc = result.cached.get
    val dir = java.nio.file.Files.createTempDirectory("cells-flat").toString
    tc.toDF().write.mode("overwrite").parquet(dir)
    val flat = s.read.parquet(dir)
      .select(col("tkey"), col("cells.pix").as("pix"),
        col("cells.users").as("users"), col("cells.trips").as("trips"))
      .as[(Long, Array[Int], Array[Long], Array[Long])]
    val k = result.k
    def bytesOf(ds: org.apache.spark.sql.Dataset[graft.model.Schemas.MvtTile]) =
      ds.collect().map(t => ((t.z, t.tx, t.ty), t.mvt.toSeq)).toMap
    val z14Obj = bytesOf(graft.mvt.MvtJobs.encodeZ14FromTileCells(tc, k))
    val z14Flat = bytesOf(graft.mvt.MvtJobs.encodeZ14Flat(flat, k))
    assert(z14Flat.nonEmpty && z14Flat === z14Obj)
    val lowerTwoShuffle = bytesOf(graft.mvt.MvtJobs.encodeTiles(
      graft.agg.Pyramid.lowerLevelsFromTiles(tc, k)))
    val lowerFusedFlat = bytesOf(graft.mvt.MvtJobs.encodeLowerFused(
      graft.agg.Pyramid.lowerPartialsFlat(flat, k)))
    assert(lowerFusedFlat.nonEmpty && lowerFusedFlat === lowerTwoShuffle)
  }

  test("MVT filesystem sink writes the reference's {z}/{x}/{y}.mvt layout") {
    implicit val s: SparkSession = spark
    val out = java.nio.file.Files.createTempDirectory("mvt-sink").toString
    val tiles = HeatmapPipeline.mvt(result.z14)
    graft.mvt.MvtJobs.writeMvtFiles(tiles, out)
    val want = tiles.collect()
    assert(want.nonEmpty)
    want.foreach { t =>
      val f = java.nio.file.Paths.get(out, t.z.toString, t.tx.toString, s"${t.ty}.mvt")
      assert(java.nio.file.Files.exists(f), f.toString)
      assert(java.nio.file.Files.readAllBytes(f).toSeq === t.mvt.toSeq)
    }
  }

  test("k-anonymity: raising k strictly shrinks (or keeps) the surviving pixel set") {
    implicit val s: SparkSession = spark
    import s.implicits._
    val up = result.userPixels
    val k3 = HeatmapAgg.globalGrain(up, 3).count()
    val k5 = HeatmapAgg.globalGrain(up, 5).count()
    val k1 = HeatmapAgg.globalGrain(up, 1).count()
    assert(k5 <= k3 && k3 <= k1)
    assert(k1 === oracleUsers.values.flatMap(_.keys).toSet.size)
  }
}
