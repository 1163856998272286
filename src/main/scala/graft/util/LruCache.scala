package graft.util

/** Tiny synchronized LRU memoization cache with an eviction
  * callback — bounds the library's caches so a long-lived service
  * never pins cached partitions (or their owning SparkSessions)
  * forever.
  *
  * Concurrency contract:
  *  - `build` runs OUTSIDE the lock: a build can be a real Spark job
  *    (scans, counts), and holding the lock across it would stall
  *    unrelated cache hits for its whole duration. Two threads may
  *    race to build the same key; the first insert wins and the
  *    loser's value is handed to `onEvict` (for Spark-side caches
  *    the loser is typically still lazy, so eviction is free).
  *  - a cache hit refreshes recency (true LRU, not FIFO): the
  *    hottest entry is never the one evicted.
  *  - `onEvict` runs outside the lock and is best-effort: it may
  *    talk to a block manager whose session has stopped, and an
  *    eviction failure must never fail the caller's lookup.
  */
final class LruCache[K, V](limit: Int, onEvict: V => Unit = (_: V) => ()) {
  require(limit > 0, s"limit must be positive, got $limit")
  private val m = scala.collection.mutable.LinkedHashMap.empty[K, V]

  def getOrElseUpdate(k: K)(build: => V): V =
    get(k).getOrElse {
      val built = build
      val (winner, evicted) = synchronized {
        m.get(k) match {
          case Some(w) =>
            m.remove(k); m.put(k, w) // lost the race; refresh winner
            (w, List(built))
          case None =>
            m.put(k, built)
            var ev = List.empty[V]
            while (m.size > limit) {
              val (ek, ew) = m.head // insertion/recency order: oldest
              m.remove(ek)
              ev ::= ew
            }
            (built, ev)
        }
      }
      evicted.foreach(e => try onEvict(e) catch { case _: Throwable => () })
      winner
    }

  /** Lookup that refreshes recency. */
  def get(k: K): Option[V] = synchronized {
    m.remove(k).map { v => m.put(k, v); v }
  }

  /** Insert-or-replace, refreshing recency — for caches whose value
    * can be UPGRADED in place (e.g. a deeper ball-size frame
    * replacing a shallower one). The displaced value and any
    * overflow evictions go to `onEvict`, outside the lock. */
  def put(k: K, v: V): Unit = {
    val evicted = synchronized {
      val old = m.remove(k).toList
      m.put(k, v)
      var ev = old
      while (m.size > limit) {
        val (ek, ew) = m.head
        m.remove(ek)
        ev ::= ew
      }
      ev
    }
    evicted.foreach(e => try onEvict(e) catch { case _: Throwable => () })
  }

  def size: Int = synchronized(m.size)

  /** Evict everything, routing each value through `onEvict` (outside
    * the lock). For the benchmark's reset-between-passes protocol and
    * tests — drop-only caches just release their references (the
    * ContextCleaner reclaims unpinned checkpoint blocks), unpersisting
    * caches free their blocks eagerly. */
  def clear(): Unit = {
    val evicted = synchronized { val vs = m.values.toList; m.clear(); vs }
    evicted.foreach(e => try onEvict(e) catch { case _: Throwable => () })
  }
}
