package graft.dedup

import org.scalatest.funsuite.AnyFunSuite

/** Kernel-level exactness tests for the dedup primitives. */
class DedupSpec extends AnyFunSuite {

  test("shingles: sliding character n-grams, short strings empty") {
    assert(Dedup.shingles("abcd", 3) === Set("abc", "bcd"))
    assert(Dedup.shingles("ab", 3) === Set.empty)
    assert(Dedup.shingles(null, 3) === Set.empty)
    assert(Dedup.shingles("aaaa", 3) === Set("aaa"))
  }

  test("jaccard: exact set semantics") {
    assert(Dedup.jaccard(Set("a", "b"), Set("a", "b")) === 1.0)
    assert(Dedup.jaccard(Set("a", "b"), Set("b", "c")) === 1.0 / 3.0)
    assert(Dedup.jaccard(Set.empty, Set.empty) === 1.0)
    assert(Dedup.jaccard(Set("a"), Set.empty) === 0.0)
  }

  test("minhash: identical sets → identical signatures; disjoint sets differ") {
    val a = Dedup.minhash(Dedup.shingles("the quick brown fox jumps"))
    val b = Dedup.minhash(Dedup.shingles("the quick brown fox jumps"))
    assert(a.toSeq === b.toSeq)
    val c = Dedup.minhash(Dedup.shingles("zzzzyyyyxxxxwwwwvvvv"))
    assert(a.toSeq !== c.toSeq)
  }

  test("minhash signature agreement approximates jaccard (seeded statistical)") {
    val rnd = new java.util.Random(7)
    (1 to 20).foreach { _ =>
      val base = (1 to 60).map(_ => rnd.nextInt(1000).toString).toSet
      val keep = base.filter(_ => rnd.nextDouble() < 0.7)
      val other = keep ++ (1 to (base.size - keep.size)).map(_ => (1000 + rnd.nextInt(1000)).toString)
      val j = Dedup.jaccard(base, other)
      val sa = Dedup.minhash(base, 256)
      val sb = Dedup.minhash(other, 256)
      val agree = sa.zip(sb).count { case (x, y) => x == y }.toDouble / 256
      assert(math.abs(agree - j) < 0.15, s"minhash est $agree vs true $j")
    }
  }

  test("lsh bands: equal signatures share all bands; banded collision for similar") {
    val sig = Dedup.minhash(Dedup.shingles("hello world this is a document"))
    assert(Dedup.lshBands(sig, 16).toSeq === Dedup.lshBands(sig, 16).toSeq)
  }

  test("simhash: deterministic; near-identical texts within small hamming distance") {
    val a = Dedup.simhash64("the quick brown fox jumps over the lazy dog again and again")
    val b = Dedup.simhash64("the quick brown fox jumps over the lazy dog again and again")
    assert(a === b)
    val c = Dedup.simhash64("the quick brown fox leaps over the lazy dog again and again")
    assert(Dedup.hamming(a, c) <= 16, s"hamming ${Dedup.hamming(a, c)}")
    val d = Dedup.simhash64("completely unrelated text about spark query engines and tiles")
    assert(Dedup.hamming(a, d) > Dedup.hamming(a, c))
  }

  test("hamming distance basics") {
    assert(Dedup.hamming(0L, 0L) === 0)
    assert(Dedup.hamming(0L, -1L) === 64)
    assert(Dedup.hamming(5L, 4L) === 1)
  }

  test("jaccardSorted on hashed shingles == jaccard on string sets") {
    val rnd = new java.util.Random(13)
    (1 to 200).foreach { _ =>
      val a = (1 to 40).map(_ => rnd.nextInt(500).toString).toSet
      val b = (1 to 40).map(_ => rnd.nextInt(500).toString).toSet
      val ja = Dedup.jaccard(a, b)
      val js = Dedup.jaccardSorted(a.map(Dedup.shingleHash).toArray.sorted,
        b.map(Dedup.shingleHash).toArray.sorted)
      assert(math.abs(ja - js) < 1e-12)
    }
  }

  test("minhashFromHashes == minhash over the same shingles") {
    val sh = Dedup.shingles("the quick brown fox jumps over everything")
    val a = Dedup.minhash(sh)
    val b = Dedup.minhashFromHashes(sh.map(Dedup.shingleHash).toArray.sorted)
    assert(a.toSeq === b.toSeq)
  }

  test("phashBlocks: disjoint cover of all 64 bits; reassembly round-trips") {
    val rnd = new java.util.Random(11)
    (1 to 50).foreach { _ =>
      val ph = rnd.nextLong()
      (1 to 8).foreach { n =>
        val blocks = Dedup.phashBlocks(ph, n)
        assert(blocks.size === n)
        val width = 64 / n
        val rebuilt = blocks.foldLeft(0L) { case (acc, (b, v)) => acc | (v << (b * width)) }
        assert(rebuilt === ph, s"n=$n lost bits")
      }
    }
    // pigeonhole witness: flipping maxDist bits leaves >= 1 of maxDist+1 blocks equal
    (1 to 50).foreach { _ =>
      val ph = rnd.nextLong()
      val maxDist = 3
      var flipped = ph
      (0 until maxDist).foreach(j => flipped ^= 1L << rnd.nextInt(64))
      val a = Dedup.phashBlocks(ph, maxDist + 1)
      val b = Dedup.phashBlocks(flipped, maxDist + 1)
      assert(a.zip(b).exists { case (x, y) => x == y }, "pigeonhole violated")
    }
  }

  test("fingerprint: deterministic, window-sensitive") {
    val t = "some document text for fingerprinting purposes"
    assert(Dedup.fingerprint(t) === Dedup.fingerprint(t))
    assert(Dedup.fingerprint("") === 0L)
  }

  test("shingleHashes == shingles.map(shingleHash).sorted (the allocation-free fast path)") {
    val rnd = new java.util.Random(7)
    def randomText(len: Int): String = {
      val alphabet = "ab cd" // tiny alphabet → plenty of repeated 3-grams to dedupe
      (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    val cases = Seq("", "ab", "abc", "aaaa", "abcabcabc") ++
      (1 to 50).map(_ => randomText(1 + rnd.nextInt(300)))
    cases.foreach { t =>
      val slow = Dedup.shingles(t).map(Dedup.shingleHash).toArray.sorted
      assert(Dedup.shingleHashes(t).toSeq === slow.toSeq, s"text=${t.take(40)}")
    }
    assert(Dedup.shingleHashes(null).isEmpty)
  }
}
