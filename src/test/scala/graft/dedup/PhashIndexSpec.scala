package graft.dedup

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The persisted phash index's contract: probe(index(batch1), batch2) ==
  * batch-mode `phashNearDups(batch1 ∪ batch2)` restricted to pairs
  * touching batch2, incl. after incremental append; radius mismatch and
  * unpruned scans are rejected loudly. */
class PhashIndexSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = graft.spark.Sessions.local(4, "phash-index-spec")

  private def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] = {
    import spark.implicits._
    df.as[(Long, Long, Long)].collect().toSet
  }

  private def blockFiles(dir: String): Int = {
    val root = new java.io.File(s"$dir/blocks")
    Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("bpb="))
      .map(d => d.listFiles().count(_.getName.endsWith(".parquet"))).sum
  }

  test("probe == batch phashNearDups restricted to pairs touching the batch; append path") {
    implicit val s: SparkSession = spark
    import s.implicits._
    // plantedPhash groups of 4 span id ranges, so a split plants pairs
    // within the index, across the split, and within each batch
    val all = (0L until 512L).map(i => (i, graft.synth.ImageSynth.plantedPhash(i)))
    val (idx1, batch2, batch3) =
      (all.filter(_._1 < 300), all.filter(t => t._1 >= 300 && t._1 < 420), all.filter(_._1 >= 420))
    val dir = java.nio.file.Files.createTempDirectory("phash-index").toString
    PhashIndex.build(idx1.toDF("id", "phash"), dir, maxDist = 3)

    def restricted(corpus: Seq[(Long, Long)], newIds: Set[Long]) =
      pairsOf(Dedup.phashNearDups(corpus.toDF("id", "phash"), maxDist = 3))
        .filter(p => newIds(p._1) || newIds(p._2))

    val got2 = pairsOf(PhashIndex.probe(dir, batch2.toDF("id", "phash"), maxDist = 3))
    val want2 = restricted(idx1 ++ batch2, batch2.map(_._1).toSet)
    assert(want2.nonEmpty, "planted groups must cross the split")
    assert(got2 === want2)

    PhashIndex.append(batch2.toDF("id", "phash"), dir, maxDist = 3)
    val got3 = pairsOf(PhashIndex.probe(dir, batch3.toDF("id", "phash"), maxDist = 3))
    val want3 = restricted(all, batch3.map(_._1).toSet)
    assert(want3.nonEmpty)
    assert(got3 === want3)

    // radius mismatch is loud, not silently wrong-recall
    val err = intercept[IllegalArgumentException](
      PhashIndex.probe(dir, batch3.toDF("id", "phash"), maxDist = 6))
    assert(err.getMessage.contains("maxDist"))

    // compaction: results invariant, crash window recoverable
    val filesBefore = blockFiles(dir)
    PhashIndex.compact(dir)
    assert(blockFiles(dir) < filesBefore, "compaction must shrink the file count")
    assert(pairsOf(PhashIndex.probe(dir, batch3.toDF("id", "phash"), maxDist = 3)) === want3,
      "compaction changed probe results")
    java.nio.file.Files.move(
      java.nio.file.Paths.get(dir, "blocks"), java.nio.file.Paths.get(dir, "blocks.old"))
    assert(pairsOf(PhashIndex.probe(dir, batch3.toDF("id", "phash"), maxDist = 3)) === want3,
      "probe did not roll back a crashed compaction")

    // pruning: the probe scan's bpb filter lands as a partition filter
    val one = Seq(batch3.head).toDF("id", "phash")
    PhashIndex.probe(dir, one, maxDist = 3).count()
    val scan = s.read.parquet(s"$dir/blocks")
      .where(org.apache.spark.sql.functions.col("bpb").isin(Seq(0, 1).map(Integer.valueOf): _*))
    val node = scan.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    assert(node.partitionFilters.nonEmpty, "bpb filter must prune directories")
    graft.stream.StreamDedup.deleteTree(dir)
  }
}
