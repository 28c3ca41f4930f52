package graft.dedup

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/**
 * The persisted LSH index's contract: probe(index(batch1), batch2) must
 * equal batch-mode `minhashNearDups(batch1 ∪ batch2)` restricted to pairs
 * touching batch2 — identical jaccard values, identical BucketCap
 * semantics — and the probe's index scan must be DIRECTORY-PRUNED to the
 * batch's bucket partitions (the scale guarantee: probe cost is bounded by
 * the batch's bucket footprint, not the index size).
 */
class LshIndexSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = graft.spark.Sessions.local(4, "lsh-index-spec")

  private val Vocab = Vector("tile", "spark", "heatmap", "pixel", "track", "user",
    "join", "query", "raster", "vector", "zoom", "layer", "cache", "shuffle",
    "plan", "codec", "batch", "merge", "index", "bucket")

  private def doc(rnd: java.util.Random, words: Int = 60): String =
    Seq.fill(words)(Vocab(rnd.nextInt(Vocab.size))).mkString(" ")

  /** 60 base docs + near-dup copies planted BOTH within the old corpus,
    * across the old/new split, and within the new batch — the probe must
    * find the cross and new-new pairs and must NOT report old-old ones. */
  private def corpus: (Seq[(Long, String)], Seq[(Long, String)], Seq[(Long, String)]) = {
    val rnd = new java.util.Random(77)
    def mutate(text: String): String = {
      val words = text.split(" ")
      words(3) = Vocab(rnd.nextInt(Vocab.size))
      words(50) = Vocab(rnd.nextInt(Vocab.size))
      words.mkString(" ")
    }
    val base = (0L until 60L).map(i => (i, doc(rnd)))
    val oldDocs = base ++ (0 until 5).map(i => (100L + i, mutate(base(i)._2)))       // old-old dups
    val batch2 = (200L until 220L).map(i => (i, doc(rnd))) ++
      (5 until 12).map(i => (300L + i, mutate(base(i)._2)))                          // cross dups
    val batch3 = (400L until 410L).map(i => (i, doc(rnd))) ++
      Seq((500L, mutate(base(20)._2))) ++                                            // cross dup vs old
      Seq((501L, mutate(batch2.head._2)))                                            // cross dup vs batch2
    (oldDocs, batch2, batch3)
  }

  private def pairsOf(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Double] = {
    import spark.implicits._
    df.as[(Long, Long, Double)].collect().map(p => (p._1, p._2) -> p._3).toMap
  }

  test("probe == batch-mode minhashNearDups restricted to pairs touching the batch") {
    implicit val s: SparkSession = spark
    import s.implicits._
    val (oldDocs, batch2, batch3) = corpus
    val dir = java.nio.file.Files.createTempDirectory("lsh-index").toString
    LshIndex.build(oldDocs.toDF("doc_id", "text"), dir, bands = 16)

    val got2 = pairsOf(LshIndex.probe(dir, batch2.toDF("doc_id", "text"), threshold = 0.7, bands = 16))
    val newIds2 = batch2.map(_._1).toSet
    val all2 = pairsOf(Dedup.minhashNearDups((oldDocs ++ batch2).toDF("doc_id", "text"),
      threshold = 0.7, bands = 16))
    val want2 = all2.filter { case ((a, b), _) => newIds2(a) || newIds2(b) }
    assert(want2.nonEmpty, "planted cross/new dups must produce pairs")
    assert(got2.keySet === want2.keySet,
      s"missing=${(want2.keySet -- got2.keySet).take(3)} extra=${(got2.keySet -- want2.keySet).take(3)}")
    got2.foreach { case (k, j) => assert(j == want2(k), s"jaccard drift at $k") }
    // no old-old pair leaks into the probe result
    assert(!got2.keySet.exists { case (a, b) => !newIds2(a) && !newIds2(b) })

    // INCREMENTAL append: index absorbs batch2, then batch3 probes against
    // old ∪ batch2 — equal to batch mode over all three, restricted
    LshIndex.append(batch2.toDF("doc_id", "text"), dir, bands = 16)
    val got3 = pairsOf(LshIndex.probe(dir, batch3.toDF("doc_id", "text"), threshold = 0.7, bands = 16))
    val newIds3 = batch3.map(_._1).toSet
    val all3 = pairsOf(Dedup.minhashNearDups((oldDocs ++ batch2 ++ batch3).toDF("doc_id", "text"),
      threshold = 0.7, bands = 16))
    val want3 = all3.filter { case ((a, b), _) => newIds3(a) || newIds3(b) }
    assert(want3.nonEmpty)
    // the planted cross-dup against the APPENDED batch2 doc must be found
    assert(want3.keySet.exists { case (a, b) => b == 501L || a == 501L })
    assert(got3.keySet === want3.keySet,
      s"missing=${(want3.keySet -- got3.keySet).take(3)} extra=${(got3.keySet -- want3.keySet).take(3)}")
    got3.foreach { case (k, j) => assert(j == want3(k), s"jaccard drift at $k") }
    graft.stream.StreamDedup.deleteTree(dir)
  }

  test("compact: one file per partition, probe results identical, crash window recoverable") {
    implicit val s: SparkSession = spark
    import s.implicits._
    val (oldDocs, batch2, batch3) = corpus
    val dir = java.nio.file.Files.createTempDirectory("lsh-compact").toString
    LshIndex.build(oldDocs.toDF("doc_id", "text"), dir, bands = 16)
    LshIndex.append(batch2.toDF("doc_id", "text"), dir, bands = 16)
    def bandFiles(): Int = {
      val root = new java.io.File(s"$dir/bands")
      Option(root.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.startsWith("bpb="))
        .map(d => d.listFiles().count(_.getName.endsWith(".parquet"))).sum
    }
    val probe3 = batch3.toDF("doc_id", "text")
    val before = pairsOf(LshIndex.probe(dir, probe3, threshold = 0.7, bands = 16))
    val filesBefore = bandFiles()
    LshIndex.compact(dir)
    val filesAfter = bandFiles()
    assert(filesAfter < filesBefore,
      s"compaction must shrink the file count (before=$filesBefore after=$filesAfter)")
    val dirsAfter = new java.io.File(s"$dir/bands").listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("bpb="))
    assert(filesAfter === dirsAfter, "exactly one file per live partition after compaction")
    assert(pairsOf(LshIndex.probe(dir, probe3, threshold = 0.7, bands = 16)) === before,
      "compaction changed probe results")
    // crash window: live renamed away, .old present — probe must recover
    java.nio.file.Files.move(
      java.nio.file.Paths.get(dir, "bands"), java.nio.file.Paths.get(dir, "bands.old"))
    assert(pairsOf(LshIndex.probe(dir, probe3, threshold = 0.7, bands = 16)) === before,
      "probe did not roll back a crashed compaction")
    graft.stream.StreamDedup.deleteTree(dir)
  }

  test("build parameters are stored and a mismatched probe/append fails loudly") {
    implicit val s: SparkSession = spark
    import s.implicits._
    val (oldDocs, batch2, _) = corpus
    val dir = java.nio.file.Files.createTempDirectory("lsh-params").toString
    LshIndex.build(oldDocs.toDF("doc_id", "text"), dir, numHashes = 64, bands = 16)
    val batchDf = batch2.toDF("doc_id", "text")
    // different band count ⇒ disjoint bucket keys ⇒ silent recall loss —
    // must throw instead
    val e1 = intercept[IllegalArgumentException] {
      LshIndex.probe(dir, batchDf, threshold = 0.7, numHashes = 64, bands = 8)
    }
    assert(e1.getMessage.contains("disjoint bucket keys"))
    intercept[IllegalArgumentException] {
      LshIndex.append(batchDf, dir, numHashes = 32, bands = 16)
    }
    // a crashed build (PARAMS never written) must read as "no index"
    java.nio.file.Files.delete(java.nio.file.Paths.get(dir, "PARAMS"))
    val e2 = intercept[IllegalArgumentException] {
      LshIndex.probe(dir, batchDf, threshold = 0.7, numHashes = 64, bands = 16)
    }
    assert(e2.getMessage.contains("PARAMS missing"))
    // matched parameters still work after a rebuild
    LshIndex.build(oldDocs.toDF("doc_id", "text"), dir, numHashes = 64, bands = 16)
    assert(LshIndex.probe(dir, batchDf, threshold = 0.7, numHashes = 64, bands = 16)
      .count() > 0)
    graft.stream.StreamDedup.deleteTree(dir)
  }

  test("probe's index scan is directory-pruned to the batch's bucket partitions") {
    implicit val s: SparkSession = spark
    import s.implicits._
    val (oldDocs, _, _) = corpus
    val dir = java.nio.file.Files.createTempDirectory("lsh-prune").toString
    LshIndex.build(oldDocs.toDF("doc_id", "text"), dir, bands = 16)
    // a single-doc batch touches at most `bands` of the bands×16 dirs
    val one = Seq((999L, oldDocs.head._2)).toDF("doc_id", "text")
    val probeDf = LshIndex.probe(dir, one, threshold = 0.7, bands = 16)
    probeDf.count()
    // re-derive the pruned scan the probe builds internally and assert the
    // bpb filter lands as partition pruning (the probe consumed its own
    // plan already; localCheckpoint hides it, so assert on the same scan)
    val touched = LshIndex
      .probeTouchedBpbs(one, numHashes = 64, bands = 16)
    val scan = s.read.parquet(s"$dir/bands")
      .where(org.apache.spark.sql.functions.col("bpb")
        .isin(touched.map(Integer.valueOf): _*))
    val scanNode = scan.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    assert(scanNode.partitionFilters.nonEmpty, "bpb filter did not land as a partition filter")
    val allDirs = new java.io.File(s"$dir/bands").listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("bpb="))
    assert(touched.size <= 16, s"single doc must touch <= bands dirs, got ${touched.size}")
    assert(scanNode.selectedPartitions.partitionCount < allDirs,
      s"probe scan read ${scanNode.selectedPartitions.partitionCount} of $allDirs partitions — not pruned")
    graft.stream.StreamDedup.deleteTree(dir)
  }
}
