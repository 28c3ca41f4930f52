package graft.stream

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Streaming near-dedup must converge to the batch phash-join oracle over
  * multi-micro-batch slicings, and saturate degenerate buckets loudly. */
class StreamDedupSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = graft.spark.Sessions.local(4, "streamdedup-spec")

  test("streamed verdicts == batch oracle (is-dup-of-any-earlier) over 3 micro-batches") {
    implicit val s: SparkSession = spark
    import s.implicits._
    val n = 300L
    val imgs = (0L until n).map(i => (i, graft.synth.ImageSynth.plantedPhash(i)))
    val df = imgs.toDF("id", "phash")

    // id-ordered slices (the arrival contract), one file per micro-batch
    val base = java.nio.file.Files.createTempDirectory("streamdedup").toString
    val flat = s"$base/flat"
    new java.io.File(flat).mkdirs()
    (0 until 3).foreach { i =>
      val dir = s"$base/c$i"
      df.where($"id" >= i * 100 && $"id" < (i + 1) * 100).coalesce(1).write.parquet(dir)
      new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
        .zipWithIndex.foreach { case (f, j) =>
          java.nio.file.Files.copy(f.toPath, java.nio.file.Paths.get(flat, s"p-$i-$j.parquet"))
        }
    }

    val got = StreamDedup.runOnce(flat, df.schema, "streamdedup_test")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Boolean]("is_dup")).toMap
    val want = StreamDedup.nearDupBatch(df)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Boolean]("is_dup")).toMap

    assert(want.values.exists(identity) && want.values.exists(!_),
      "planted corpus must contain both dups and originals")
    assert(got === want)
  }

  test("saturated degenerate bucket: stops growing, keeps matching, flags loudly") {
    implicit val s: SparkSession = spark
    import s.implicits._
    // 60 identical phashes through one batch with a tiny bucket cap
    val flatImgs = (0L until 60L).map(i => (i, 0x00F0F0F0F0F0F0F0L)).toDF("id", "phash")
    val base = java.nio.file.Files.createTempDirectory("streamdedup-cap").toString + "/imgs"
    flatImgs.coalesce(1).write.parquet(base)

    val verdicts = {
      val src = s.readStream.schema(flatImgs.schema)
        .parquet(base)
      val q = StreamDedup.nearDupStream(src, maxDist = 3, maxBucketState = 10).writeStream
        .format("memory").queryName("streamdedup_cap")
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Update())
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      StreamDedup.collapse(s.table("streamdedup_cap"))
        .collect().map(r => (r.getAs[Long]("id"),
          r.getAs[Boolean]("is_dup"), r.getAs[Boolean]("any_bucket_full")))
    }
    // every image after the first is a dup (identical phash) even though
    // the bucket stopped retaining members after 10
    assert(verdicts.filter(_._1 > 0L).forall(_._2), "saturated bucket must keep matching")
    assert(!verdicts.find(_._1 == 0L).get._2, "first arrival is the original")
    assert(verdicts.exists(_._3), "overflow must be flagged, never silent")
  }
}
