package graft.operators

/** Session-scoped LRU-bounded memo backing the library's reusable
  * artifacts (shingle tables, trained centroid matrices, cluster labels).
  *
  * The artifacts these memos hold are the single-JVM analog of a
  * production deployment's PERSISTED index/feature tables, so the memo
  * pattern itself is load-bearing — but an unbounded ConcurrentHashMap
  * keyed by (session, dir, params) accumulates localCheckpoint block
  * storage forever in a long-lived JVM serving many sessions/corpora.
  * This wrapper caps the entry count and runs `onEvict` (typically
  * `DataFrame.unpersist`) on whatever falls off the LRU end, so block-
  * manager storage is bounded by `maxEntries × artifact size` instead of
  * by session lifetime. Bounds are set comfortably above any single
  * session's working set (a handful of (dir, param) combinations); an
  * eviction only ever costs a rebuild, never correctness.
  *
  * `getOrElseUpdate` serializes builders under the memo's lock — same
  * semantics as the `computeIfAbsent` it replaces (builders here are
  * driver-side orchestration; concurrent queries on one session are not a
  * supported pattern).
  */
private[graft] final class BoundedMemo[K, V](maxEntries: Int)(onEvict: V => Unit) {
  private val map = new java.util.LinkedHashMap[K, V](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[K, V]): Boolean = {
      val evict = size() > maxEntries
      if (evict) {
        // never let a failed unpersist (e.g. an already-stopped session)
        // poison the insert that triggered the eviction
        try onEvict(e.getValue) catch { case _: Throwable => () }
      }
      evict
    }
  }

  def getOrElseUpdate(k: K)(f: => V): V = synchronized {
    val existing = map.get(k)
    if (existing != null) existing
    else {
      val v = f
      map.put(k, v)
      v
    }
  }
}

private[graft] object BoundedMemo {
  /** Evictor for DataFrame-valued entries: drop the checkpoint/cache
    * blocks behind the frame (non-blocking; a dead session is a no-op). */
  val unpersistDf: org.apache.spark.sql.DataFrame => Unit =
    df => { df.unpersist(blocking = false); () }
}
