package graft.dedup

import org.apache.spark.sql.{Observation, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/**
 * Spark-level tests for the MinHash-LSH near-dup job: candidate pairs vs the
 * exact all-pairs Jaccard oracle, and the bucket-size cap that keeps a
 * degenerate (boilerplate) corpus from going O(n²) in the bucket self-join.
 */
class DedupJobsSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = graft.spark.Sessions.local(4, "dedup-jobs-spec")

  private val Vocab = Vector("tile", "spark", "heatmap", "pixel", "track", "user",
    "join", "query", "raster", "vector", "zoom", "layer", "cache", "shuffle",
    "plan", "codec", "batch", "merge", "index", "bucket")

  private def doc(rnd: java.util.Random, words: Int = 60): String =
    Seq.fill(words)(Vocab(rnd.nextInt(Vocab.size))).mkString(" ")

  /** 40 random docs + 10 planted near-dup copies (2 words swapped). */
  private def corpus: (Seq[(Long, String)], Set[(Long, Long)]) = {
    val rnd = new java.util.Random(31)
    val base = (0L until 40L).map(i => (i, doc(rnd)))
    val planted = (0 until 10).map { i =>
      val words = base(i)._2.split(" ")
      words(5) = Vocab(rnd.nextInt(Vocab.size))
      words(40) = Vocab(rnd.nextInt(Vocab.size))
      (1000L + i, words.mkString(" "))
    }
    (base ++ planted, (0 until 10).map(i => (i.toLong, 1000L + i)).toSet)
  }

  test("minhashNearDups ⊆ exact-jaccard pairs; planted near-dups recalled") {
    implicit val s: SparkSession = spark
    import s.implicits._
    val (docs, plantedPairs) = corpus
    val df = docs.toDF("doc_id", "text")
    val got = Dedup.minhashNearDups(df, threshold = 0.7)
      .select("a", "b", "jaccard").as[(Long, Long, Double)].collect()

    // exact all-pairs oracle on the raw string shingle sets
    val sets = docs.map { case (id, t) => id -> Dedup.shingles(t) }.toMap
    val exact = (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      j = Dedup.jaccard(sa, sb) if j >= 0.7
    } yield ((a, b), j)).toMap

    got.foreach { case (a, b, j) =>
      assert(exact.contains((a, b)), s"invented pair ($a,$b)")
      assert(math.abs(exact((a, b)) - j) < 1e-9)
    }
    val gotPairs = got.map(t => (t._1, t._2)).toSet
    assert(plantedPairs.subsetOf(exact.keySet))
    val recall = gotPairs.intersect(plantedPairs).size.toDouble / plantedPairs.size
    assert(recall >= 0.8, s"LSH recall $recall")
  }

  test("bucket cap bounds a boilerplate-heavy corpus; drops are observed, not silent") {
    implicit val s: SparkSession = spark
    import s.implicits._
    val (docs, plantedPairs) = corpus
    // 300 identical boilerplate docs: every band hashes them into ONE bucket
    // → the uncapped self-join would generate 300·299/2 pairs per band
    val boiler = (2000L until 2300L).map(i => (i, "identical boilerplate text " * 10))
    val df = (docs ++ boiler).toDF("doc_id", "text")

    val obs = Observation("lsh-cap")
    val got = Dedup.minhashNearDups(df, threshold = 0.7, maxBucket = 50, capObs = Some(obs))
      .select("a", "b").as[(Long, Long)].collect()

    val metrics = obs.get
    assert(metrics("dropped_rows").asInstanceOf[Long] > 0L, "cap must report drops")
    assert(metrics("dropped_buckets").asInstanceOf[Long] > 0L)
    // no boilerplate-boilerplate pair survives (their buckets are all capped)
    assert(!got.exists { case (a, b) => a >= 2000L && b >= 2000L })
    // bounded output: nothing quadratic in the boilerplate count
    assert(got.length < 200, s"pair count ${got.length} not bounded")
    // the planted near-dups (small buckets) are still recalled
    val recall = got.toSet.intersect(plantedPairs).size.toDouble / plantedPairs.size
    assert(recall >= 0.8, s"recall under cap $recall")
  }
}
