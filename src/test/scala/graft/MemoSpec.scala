package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BoundedMemo

/** The LRU session memo backing every reusable artifact registry:
  * caching, access-ordered eviction, and the evict hook must be exact —
  * an over-eager eviction silently rebuilds artifacts (perf), a missed
  * one leaks checkpoint blocks (the ADVICE finding this class fixes). */
class MemoSpec extends AnyFunSuite {

  test("getOrElseUpdate builds once per key and returns the cached value") {
    var builds = 0
    val m = new BoundedMemo[String, Int](4)(_ => ())
    def get(k: String, v: Int): Int = m.getOrElseUpdate(k) { builds += 1; v }
    assert(get("a", 1) === 1)
    assert(get("a", 99) === 1, "second lookup must serve the cached value")
    assert(builds === 1)
  }

  test("eviction is LRU by ACCESS order and fires onEvict exactly once per victim") {
    var evicted = List.empty[Int]
    val m = new BoundedMemo[String, Int](2)(v => evicted = v :: evicted)
    def get(k: String, v: Int): Int = m.getOrElseUpdate(k)(v)
    get("a", 1)
    get("b", 2)
    get("a", 1) // touch a → LRU order is now [b, a]
    get("c", 3) // over capacity → b (least recently used) evicted
    assert(evicted === List(2), s"expected only b evicted, got $evicted")
    var rebuilt = false
    assert(m.getOrElseUpdate("a") { rebuilt = true; -1 } === 1 && !rebuilt,
      "a was touched most recently and must survive")
    // b rebuilds (cache miss) and evicts the new LRU victim: c
    assert(m.getOrElseUpdate("b")(20) === 20)
    assert(evicted === List(3, 2))
  }

  test("an onEvict failure cannot poison the insert that triggered it") {
    val m = new BoundedMemo[String, Int](1)(_ => throw new RuntimeException("boom"))
    assert(m.getOrElseUpdate("a")(1) === 1)
    assert(m.getOrElseUpdate("b")(2) === 2) // evicts a; hook throws; insert survives
    assert(m.getOrElseUpdate("b")(99) === 2)
  }
}
