package graft.ann

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/**
 * The persisted embedding index's contract (the LshIndexSpec scheme on the
 * third modality): probe(index(old), batch) must equal batch-mode
 * `Ann.lshNearDupPairs(old ∪ batch)` restricted to pairs touching the
 * batch — identical sims, identical BucketCap semantics — and the build
 * parameters must guard probes loudly.
 */
class EmbIndexSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = graft.spark.Sessions.local(4, "emb-index-spec")

  /** 60 seeded vectors + near-dup perturbations planted within the old
    * corpus, across the split, and within the new batch. */
  private def corpus: (Seq[(Long, Array[Float])], Seq[(Long, Array[Float])]) = {
    val rnd = new java.util.Random(91)
    def vec(): Array[Float] = Array.fill(24)(rnd.nextFloat() * 2 - 1)
    def near(v: Array[Float]): Array[Float] = {
      val c = v.clone(); c(1) += 0.02f; c(9) -= 0.02f; c
    }
    val base = (0L until 60L).map(i => (i, vec()))
    val oldVecs = base ++ (0 until 5).map(i => (100L + i, near(base(i)._2)))
    val batch = (200L until 220L).map(i => (i, vec())) ++
      (5 until 12).map(i => (300L + i, near(base(i)._2))) ++          // cross dups
      Seq((400L, near(base(50)._2)), (401L, near(near(base(50)._2)))) // new-new chain
    (oldVecs, batch)
  }

  private def pairsOf(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Double] = {
    import spark.implicits._
    df.as[(Long, Long, Double)].collect().map(p => (p._1, p._2) -> p._3).toMap
  }

  test("probe == batch-mode lshNearDupPairs restricted to pairs touching the batch") {
    implicit val s: SparkSession = spark
    import s.implicits._
    val (oldVecs, batch) = corpus
    val dir = java.nio.file.Files.createTempDirectory("emb-index").toString
    EmbIndex.build(oldVecs.toDF("vec_id", "embedding"), dir, nPlanes = 12)

    val got = pairsOf(EmbIndex.probe(dir, batch.toDF("vec_id", "embedding"),
      threshold = 0.9, nPlanes = 12))
    val newIds = batch.map(_._1).toSet
    val all = pairsOf(Ann.lshNearDupPairs((oldVecs ++ batch).toDF("vec_id", "embedding"),
      threshold = 0.9, nPlanes = 12))
    val want = all.filter { case ((a, b), _) => newIds(a) || newIds(b) }
    assert(want.nonEmpty, "planted cross/new dups must produce pairs")
    assert(got.keySet === want.keySet,
      s"missing=${(want.keySet -- got.keySet).take(3)} extra=${(got.keySet -- want.keySet).take(3)}")
    got.foreach { case (k, sim) => assert(sim == want(k), s"sim drift at $k") }
    // no old-old pair leaks into the probe result
    assert(!got.keySet.exists { case (a, b) => !newIds(a) && !newIds(b) })

    // append: the batch becomes index; a second batch still matches batch mode
    EmbIndex.append(batch.toDF("vec_id", "embedding"), dir, nPlanes = 12)
    val batch2 = Seq((500L, corpus._1(20)._2.clone())) // exact copy of an old vec
    val got2 = pairsOf(EmbIndex.probe(dir, batch2.toDF("vec_id", "embedding"),
      threshold = 0.9, nPlanes = 12))
    val all2 = pairsOf(Ann.lshNearDupPairs((oldVecs ++ batch ++ batch2).toDF("vec_id", "embedding"),
      threshold = 0.9, nPlanes = 12))
    val want2 = all2.filter { case ((a, b), _) => a == 500L || b == 500L }
    assert(want2.nonEmpty && got2.keySet === want2.keySet)
    graft.stream.StreamDedup.deleteTree(dir)
  }

  test("build parameters are stored; a mismatched probe fails loudly") {
    implicit val s: SparkSession = spark
    import s.implicits._
    val (oldVecs, batch) = corpus
    val dir = java.nio.file.Files.createTempDirectory("emb-params").toString
    EmbIndex.build(oldVecs.toDF("vec_id", "embedding"), dir, nPlanes = 12)
    val batchDf = batch.toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      EmbIndex.probe(dir, batchDf, threshold = 0.9, nPlanes = 16)
    }
    assert(e.getMessage.contains("disjoint bucket keys"))
    java.nio.file.Files.delete(java.nio.file.Paths.get(dir, "PARAMS"))
    val e2 = intercept[IllegalArgumentException] {
      EmbIndex.probe(dir, batchDf, threshold = 0.9, nPlanes = 12)
    }
    assert(e2.getMessage.contains("PARAMS missing"))
    graft.stream.StreamDedup.deleteTree(dir)
  }
}
