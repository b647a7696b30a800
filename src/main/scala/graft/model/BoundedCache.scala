package graft.model

/** Size-bounded LRU memo for fit-once served state (r10 verdict
  * "what's wrong" item 2): the plan-keyed caches (MinHash signature
  * tables, LM models, score frames) are unbounded maps, so a
  * long-lived driver that iterates corpus versions accumulates dead
  * entries — and the executor storage behind them — for the JVM
  * lifetime. This cache holds at most `maxEntries` entries in
  * access order; inserting past the bound evicts the
  * least-recently-used entry and hands it to `onEvict` (the caches
  * pass [[Checkpoints.release]]-shaped hooks so the evicted frame's
  * block storage is freed, not just dereferenced).
  *
  * Contract for served frames: an entry is valid while it LIVES in
  * the cache — callers take the current corpus version's frame and
  * use it; holding a served frame across `maxEntries` intervening
  * corpus builds is outside the contract (the storage behind it may
  * have been released). The explicit `clear*()` hatches stay the
  * staleness escape for in-place input rewrites.
  *
  * All operations synchronize on the underlying map — these caches
  * see a handful of build-or-serve calls per query, never hot-path
  * traffic.
  */
final class BoundedCache[V](maxEntries: Int,
                            onEvict: V => Unit = (_: V) => ()) {
  require(maxEntries > 0, s"maxEntries=$maxEntries must be > 0")

  private val m =
    new java.util.LinkedHashMap[String, V](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, V]): Boolean = {
        val evict = this.size() > maxEntries
        if (evict) onEvict(e.getValue)
        evict
      }
    }

  def get(k: String): V = m.synchronized(m.get(k))

  def put(k: String, v: V): Unit = m.synchronized { m.put(k, v); () }

  def remove(k: String): Unit = m.synchronized { m.remove(k); () }

  /** Drop everything WITHOUT the evict hook — the `clear*()` hatches
    * run on caches whose frames may already be dead (stopped
    * context) or still referenced by the caller doing the clearing.
    */
  def clear(): Unit = m.synchronized(m.clear())

  /** Iterate a snapshot (the callback may remove entries). Snapshot
    * iteration does NOT count as access for LRU order.
    */
  def forEach(f: (String, V) => Unit): Unit = {
    val entries = m.synchronized {
      val it = m.entrySet().iterator()
      val buf = scala.collection.mutable.ArrayBuffer.empty[(String, V)]
      while (it.hasNext) { val e = it.next(); buf += e.getKey -> e.getValue }
      buf.toSeq
    }
    entries.foreach { case (k, v) => f(k, v) }
  }

  def size: Int = m.synchronized(m.size())
}
