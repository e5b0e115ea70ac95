package graft

/** Run independent driver-side Spark actions CONCURRENTLY (guide §2.6
  * thread-pooled actions): Spark's scheduler happily runs several jobs at
  * once inside one application — actions are only sequential because the
  * driver calls them sequentially. Overlapping 2-3 small builds/writes
  * back-fills the scheduling latency and stage tails each would pay
  * serially; job descriptions and other local properties are inherited by
  * the pool threads, so attribution survives. Bounded width, pool never
  * outlives the call, failures rethrow the ORIGINAL exception.
  */
private[graft] object Par {

  /** Evaluate every thunk concurrently (bounded width), returning results
    * in input order. */
  def all[T](fs: Seq[() => T], width: Int = 3): Seq[T] = {
    if (fs.length <= 1) return fs.map(_())
    val pool = java.util.concurrent.Executors.newFixedThreadPool(math.min(width, fs.length))
    try {
      val futs = fs.map(f => pool.submit(new java.util.concurrent.Callable[T] {
        def call(): T = f()
      }))
      futs.map { fut =>
        try fut.get()
        catch { case e: java.util.concurrent.ExecutionException => throw e.getCause }
      }
    } finally pool.shutdownNow()
  }

  /** [[all]] for side-effecting writes. */
  def run(actions: Seq[() => Unit], width: Int = 3): Unit = { all(actions, width); () }
}
