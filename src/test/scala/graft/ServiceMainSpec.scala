package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.model.Schemas.Track
import graft.synth.{ImageSynth, TraceSynth}

/** The spark-submit service entry end-to-end: conf-driven, streaming and
  * batch modes, MVT tree exported, results equal across modes. */
class ServiceMainSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = graft.spark.Sessions.local(4, "service-spec")

  private val N = 150
  private def writeTracks(dir: String)(implicit s: SparkSession): Unit = {
    import s.implicits._
    s.createDataset((0L until N).map { i =>
      val ph = ImageSynth.phashOf(i)
      Track(i, TraceSynth.userOf(ph, 6), TraceSynth.trace(ph))
    }).write.mode("overwrite").parquet(dir)
  }

  private def runMode(mode: String): (String, Long) = {
    implicit val s: SparkSession = spark
    val data = Files.createTempDirectory(s"svc-data-$mode").toString
    val out = Files.createTempDirectory(s"svc-out-$mode").toString
    writeTracks(data)
    s.conf.set("spark.graft.mode", mode)
    s.conf.set("spark.graft.dataPath", data)
    s.conf.set("spark.graft.outputPath", out)
    s.conf.set("spark.graft.maxContributions", "60")
    ServiceMain.run(s)
    val store = new graft.io.TileStore(s"$out/store")
    (out, store.currentVersion)
  }

  test("batch and service modes commit state and export the mvt tree; results equal") {
    implicit val s: SparkSession = spark
    val (outBatch, vBatch) = runMode("batch")
    val (outSvc, vSvc) = runMode("service")
    assert(vBatch >= 1 && vSvc >= 1)
    def globalOf(out: String) = {
      val store = new graft.io.TileStore(s"$out/store")
      store.read("global", Some(graft.pipeline.Incremental.globalSchema)).get.collect()
        .map(r => ((r.getAs[Int]("z"), r.getAs[Long]("gx"), r.getAs[Long]("gy")),
          (r.getAs[Long]("users"), r.getAs[Long]("trips")))).toMap
    }
    val gb = globalOf(outBatch)
    assert(gb.nonEmpty)
    assert(globalOf(outSvc) === gb)
    // mvt trees exist and decode
    Seq(outBatch, outSvc).foreach { out =>
      val mvts = {
        val st = java.nio.file.Files.walk(java.nio.file.Paths.get(s"$out/mvt"))
        try {
          import scala.jdk.CollectionConverters._
          st.iterator().asScala.filter(_.toString.endsWith(".mvt")).toList
        } finally st.close()
      }
      assert(mvts.nonEmpty)
      val feats = graft.core.MvtCodec.decodeTile(Files.readAllBytes(mvts.head))
      assert(feats.nonEmpty)
    }
  }
}
