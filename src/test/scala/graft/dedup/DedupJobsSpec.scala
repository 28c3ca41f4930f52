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

  test("jaccardJoin == exact all-pairs kernel jaccard (inverted index loses nothing)") {
    implicit val s: SparkSession = spark
    import s.implicits._
    val (docs, plantedPairs) = corpus
    // contract: sub-n docs carry NO shingles and are excluded from pairing
    // (kernel jaccard(∅,∅)=1.0 would pair every empty doc with every other
    // — route those through exact dedup); the oracle below mirrors that
    val withShort = docs ++ Seq((9000L, "ab"), (9001L, "x"), (9002L, null: String))
    val got = Dedup.jaccardJoin(withShort.toDF("doc_id", "text"), threshold = 0.7)
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap
    assert(!got.keySet.exists { case (a, b) => a >= 9000L || b >= 9000L },
      "shingle-less docs must not pair")
    val sets = docs.map { case (id, t) => id -> Dedup.shingles(t) }.toMap
    val want = (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      j = Dedup.jaccard(sa, sb) if j >= 0.7
    } yield (a, b) -> j).toMap
    assert(want.nonEmpty && plantedPairs.subsetOf(want.keySet))
    assert(got.keySet === want.keySet,
      s"missing=${(want.keySet -- got.keySet).take(3)} extra=${(got.keySet -- want.keySet).take(3)}")
    got.foreach { case (k, j) => assert(math.abs(j - want(k)) < 1e-6, s"pair $k jaccard off") }
  }

  test("connectedComponents == union-find on random graphs (incl. a long path: pointer jumping works)") {
    implicit val s: SparkSession = spark
    import s.implicits._
    // in-test oracle: classic union-find with path compression
    def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      (0 until n).map(i => i.toLong -> find(i).toLong).toMap
    }
    val rnd = new java.util.Random(42)
    val cases: Seq[(Int, Seq[(Long, Long)])] = Seq(
      // sparse random graph with singletons
      (200, Seq.fill(120)((rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
        .filter { case (a, b) => a != b }),
      // one long PATH 0-1-2-...-99: diameter 99, must converge in O(log n)
      (100, (0 until 99).map(i => (i.toLong, i.toLong + 1))),
      // empty edge set: everything a singleton
      (50, Seq.empty[(Long, Long)]))
    cases.foreach { case (n, edges) =>
      val pairs = if (edges.isEmpty)
        Seq.empty[(Long, Long)].toDF("a", "b") else edges.toDF("a", "b")
      val nodes = (0 until n).map(_.toLong).toDF("doc_id")
      val got = Dedup.connectedComponents(pairs, nodes)
        .as[(Long, Long)].collect().toMap
      val want = unionFind(n, edges)
      assert(got === want, s"n=$n edges=${edges.size}")
    }
    // non-convergence is loud: 1 round cannot finish the 100-node path
    intercept[IllegalArgumentException] {
      Dedup.connectedComponents(
        (0 until 99).map(i => (i.toLong, i.toLong + 1)).toDF("a", "b"),
        (0 until 100).map(_.toLong).toDF("doc_id"), maxRounds = 1)
    }
    // the non-broadcast (at-scale sort-merge) regime exercises the
    // DECLARED edge partitioning (freshLocalCheckpointClusteredBy): the
    // per-round edges ⋈ labels join then trusts the checkpoint's layout
    // instead of re-exchanging it — a wrong declaration would silently
    // mis-join, so this re-runs a case with broadcast disabled
    val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val (n, edges) = cases.head
      val got = Dedup.connectedComponents(edges.toDF("a", "b"),
          (0 until n).map(_.toLong).toDF("doc_id"))
        .as[(Long, Long)].collect().toMap
      assert(got === unionFind(n, edges), "SMJ-regime CC diverged from union-find")
    } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("dedup jobs own their cache lifetime: no persisted relation survives the call") {
    implicit val s: SparkSession = spark
    import s.implicits._
    s.sharedState.cacheManager.clearCache()
    val (docs, _) = corpus
    val df = docs.toDF("doc_id", "text")
    Dedup.minhashNearDups(df, threshold = 0.7).count()
    assert(s.sharedState.cacheManager.isEmpty,
      "minhashNearDups leaked a persisted relation")
    Dedup.jaccardJoin(df, threshold = 0.7).count()
    assert(s.sharedState.cacheManager.isEmpty,
      "jaccardJoin leaked a persisted relation")
  }

  test("phashNearDups == brute-force hamming pairs (recall exactly 1, not approximate)") {
    implicit val s: SparkSession = spark
    import s.implicits._
    val n = 512L
    val phs = (0L until n).map(i => (i, graft.synth.ImageSynth.plantedPhash(i)))
    val got = Dedup.phashNearDups(phs.toDF("id", "phash"), maxDist = 3)
      .as[(Long, Long, Long)].collect().toSet

    val exact = (for {
      (a, pa) <- phs; (b, pb) <- phs if a < b
      d = Dedup.hamming(pa, pb) if d <= 3
    } yield (a, b, d.toLong)).toSet
    assert(exact.nonEmpty, "planted corpus must produce near-dup pairs")
    // the full non-trivial hamming band is exercised, including the
    // boundary dist == 3 (dist 0 would need two identical phashes — the
    // planted corpus keeps all hashes distinct; identical-hash handling
    // is covered by the degenerate-cluster test below)
    assert((1L to 3L).forall(d => exact.exists(_._3 == d)), "spectrum gap in planted corpus")
    assert(got === exact,
      s"missing=${(exact -- got).take(3)} extra=${(got -- exact).take(3)}")
  }

  test("phashNearDups: degenerate identical-phash cluster is capped with observed drops") {
    implicit val s: SparkSession = spark
    import s.implicits._
    // 300 flat images sharing ONE phash (every block collides) + a normal tail
    val flat = (0L until 300L).map(i => (i, 0x0123456789ABCDEFL))
    val tail = (1000L until 1200L).map(i => (i, graft.synth.ImageSynth.plantedPhash(i)))
    val obs = Observation("phash-cap")
    val got = Dedup.phashNearDups((flat ++ tail).toDF("id", "phash"),
        maxDist = 3, maxBucket = 50, capObs = Some(obs))
      .as[(Long, Long, Long)].collect()
    val metrics = obs.get
    assert(metrics("dropped_rows").asInstanceOf[Long] > 0L)
    assert(!got.exists { case (a, b, _) => a < 300L && b < 300L },
      "capped cluster must not self-join")
    // the tail's planted pairs are unaffected by the cap
    val tailExact = (for {
      (a, pa) <- tail; (b, pb) <- tail if a < b
      d = Dedup.hamming(pa, pb) if d <= 3
    } yield (a, b, d.toLong)).toSet
    assert(got.filter(p => p._1 >= 1000L).toSet === tailExact)
  }

  test("simhashNearDups == brute-force hamming pairs over simhash64 (batch SimHash join)") {
    implicit val s: SparkSession = spark
    import s.implicits._
    val (docs, _) = corpus
    // exact copies (hamming 0) + one-word swaps (small hamming) guarantee
    // the join is non-trivially exercised across the 0..3 band
    val copies = (0 until 5).map(i => (3000L + i, docs(i)._2))
    val swaps = (0 until 5).map { i =>
      val words = docs(i)._2.split(" ")
      words(7) = Vocab((i + 3) % Vocab.size)
      (4000L + i, words.mkString(" "))
    }
    val all = docs ++ copies ++ swaps
    val got = Dedup.simhashNearDups(all.toDF("doc_id", "text"), maxDist = 3)
      .as[(Long, Long, Long)].collect().toSet
    val hashes = all.map { case (id, t) => (id, Dedup.simhash64(t)) }
    val exact = (for {
      (a, ha) <- hashes; (b, hb) <- hashes if a < b
      d = Dedup.hamming(ha, hb) if d <= 3
    } yield (a, b, d.toLong)).toSet
    assert(exact.exists(_._3 == 0L), "planted exact copies must land at dist 0")
    assert(got === exact,
      s"missing=${(exact -- got).take(3)} extra=${(got -- exact).take(3)}")
  }

  test("phashClusters == union-find over brute-force hamming pairs (image keep-list)") {
    implicit val s: SparkSession = spark
    import s.implicits._
    val n = 512
    val phs = (0L until n.toLong).map(i => (i, graft.synth.ImageSynth.plantedPhash(i)))
    val got = Dedup.phashClusters(phs.toDF("id", "phash"), maxDist = 3)
      .as[(Long, Long)].collect().toMap
    // oracle: union-find with path compression over exact all-pairs hamming
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
    for { (a, pa) <- phs; (b, pb) <- phs if a < b && Dedup.hamming(pa, pb) <= 3 } {
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = (0 until n).map(i => i.toLong -> find(i).toLong).toMap
    assert(got === want)
    // the corpus plants groups: the keep-list must be a strict subset
    assert(got.values.toSet.size < n, "planted near-dup groups must merge")
    assert(got.values.toSet.subsetOf(got.keySet), "cluster ids are member ids")
  }

  test("incrementalClusters(cc(A), probe pairs, B) == cc(A ∪ B) — incremental == batch") {
    implicit val s: SparkSession = spark
    import s.implicits._
    val rnd = new java.util.Random(7)
    // old corpus 0..149 with random edges; batch 1000..1039 with pairs
    // touching the batch: batch-batch, batch-old (incl. a chain MERGING two
    // old clusters through one new node), and none for some (singletons)
    val oldEdges = Seq.fill(80)((rnd.nextInt(150).toLong, rnd.nextInt(150).toLong))
      .filter { case (a, b) => a != b }
    val batchIds = (1000L until 1040L)
    val batchEdges =
      Seq((1000L, 1001L), (1001L, 1002L), // batch-batch chain
          (5L, 1003L), (1003L, 77L),      // old-new-old bridge (cluster merge)
          (1004L, 9L), (1005L, 1004L)) ++ // new-old + new-new
      Seq.fill(30)((batchIds(rnd.nextInt(40)), rnd.nextInt(150).toLong))
    val oldLabels = Dedup.connectedComponents(
      oldEdges.toDF("a", "b"), (0L until 150L).toDF("id"))
    val got = Dedup.incrementalClusters(
        oldLabels, batchEdges.toDF("a", "b"), batchIds.toDF("id"))
      .as[(Long, Long)].collect().toMap
    // oracle: batch-mode CC over the UNION graph
    val want = Dedup.connectedComponents(
        (oldEdges ++ batchEdges).toDF("a", "b"),
        ((0L until 150L) ++ batchIds).toDF("id"))
      .as[(Long, Long)].collect().toMap
    assert(got === want)
    // the bridge actually merged two previously-distinct old clusters
    // (guard the fixture: the interesting path must have been exercised)
    val before = oldLabels.as[(Long, Long)].collect().toMap
    assert(before(5L) != before(77L) || oldEdges.exists { case (a, b) =>
      Set(a, b) == Set(5L, 77L) }, "fixture: 5 and 77 should start separate")
    assert(got(5L) === got(77L) && got(5L) === got(1003L))
    // an edgeless batch is a pure singleton append: nothing relabels
    val untouched = Dedup.incrementalClusters(
        oldLabels, Seq.empty[(Long, Long)].toDF("a", "b"),
        Seq(2000L, 2001L).toDF("id"))
      .as[(Long, Long)].collect().toMap
    assert(untouched.view.filterKeys(_ < 150L).toMap === before)
    assert(untouched(2000L) === 2000L && untouched(2001L) === 2001L)
  }

  test("applyKeepList keeps exactly one canonical doc per cluster") {
    implicit val s: SparkSession = spark
    import s.implicits._
    val (docs, planted) = corpus
    val df = docs.toDF("doc_id", "text")
    val clusters = Dedup.dedupClusters(df, threshold = 0.7)
    val kept = Dedup.applyKeepList(df, clusters).as[(Long, String)].collect().map(_._1).toSet
    val byCluster = clusters.as[(Long, Long)].collect().groupBy(_._2)
    assert(kept === byCluster.keySet, "kept set must be exactly the cluster ids")
    byCluster.foreach { case (cid, members) =>
      assert(cid === members.map(_._1).min, "canonical id must be the cluster minimum")
    }
    // a planted near-dup pair can never BOTH survive dedup
    planted.foreach { case (a, b) => assert(!(kept(a) && kept(b)), s"pair ($a,$b) both kept") }
    assert(kept.size < docs.size, "planted dups must be dropped")
  }

  test("connectedComponents rejects orphan edge endpoints (pairs ⊄ nodes is loud)") {
    implicit val s: SparkSession = spark
    import s.implicits._
    val err = intercept[IllegalArgumentException] {
      Dedup.connectedComponents(
        Seq((1L, 2L), (2L, 99L)).toDF("a", "b"), // 99 missing from nodes
        Seq(1L, 2L, 3L).toDF("id"))
    }
    assert(err.getMessage.contains("missing from nodes"))
  }
}
