package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TopKBuffer

/** Seeded randomized properties for the bounded top-k buffer — the kernel
  * under every kNN/probe/refine path. Distribution correctness depends on
  * one invariant: ANY insertion order and ANY partition split (map-side
  * partials merged in any order) must produce exactly the sorted take-k,
  * ties to the lower id, in both orderings. 300 random cases with
  * duplicate-heavy scores exercise the tie-break and heap paths far past
  * what the fixed-fixture spec covers. */
class TopKPropertySpec extends AnyFunSuite {

  private def reference(pairs: Seq[(Double, Long)], k: Int,
                        smallestFirst: Boolean): Seq[(Double, Long)] =
    pairs.sortWith { case ((s1, i1), (s2, i2)) =>
      if (s1 != s2) { if (smallestFirst) s1 < s2 else s1 > s2 } else i1 < i2
    }.take(k)

  test("TopKBuffer == sorted take-k for random inputs, splits, and merge orders") {
    val rnd = new scala.util.Random(42)
    for (iter <- 1 to 300) {
      val n = rnd.nextInt(60)
      val k = 1 + rnd.nextInt(12)
      val smallestFirst = rnd.nextBoolean()
      // coarse score grid → many exact ties; small id range → id ties too
      val pairs = Seq.fill(n)((rnd.nextInt(8).toDouble / 2.0, rnd.nextInt(20).toLong))
      val (p1, p2) = pairs.splitAt(if (n == 0) 0 else rnd.nextInt(n + 1))

      val b1 = new TopKBuffer(k, smallestFirst)
      val b2 = new TopKBuffer(k, smallestFirst)
      p1.foreach { case (s, id) => b1.insert(s, id) }
      p2.foreach { case (s, id) => b2.insert(s, id) }
      // merge partials the way the aggregate does: pour one into the other
      b2.sortedPairs.foreach { case (s, id) => b1.insert(s, id) }

      val got = b1.sortedPairs.toSeq
      val want = reference(pairs, k, smallestFirst)
      assert(got === want,
        s"iter=$iter k=$k smallestFirst=$smallestFirst n=$n split=${p1.length}")
    }
  }

  test("k = 0 and k larger than input are total") {
    val b0 = new TopKBuffer(0, smallestFirst = false)
    b0.insert(1.0, 1L)
    assert(b0.sortedPairs.isEmpty)
    val big = new TopKBuffer(10, smallestFirst = true)
    Seq((3.0, 3L), (1.0, 1L), (2.0, 2L)).foreach { case (s, id) => big.insert(s, id) }
    assert(big.sortedPairs.toSeq === Seq((1.0, 1L), (2.0, 2L), (3.0, 3L)))
  }
}
