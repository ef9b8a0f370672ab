package graft.core

/**
 * Tiny synchronized access-order LRU for the driver-side caches
 * (snapshots, dv broadcasts, executor vectors, metadata-fold memos):
 * bounded, hot entries survive churn (no clear-on-overflow storms),
 * and an optional eviction hook releases held resources (e.g.
 * unpersisting an evicted broadcast). One definition so the
 * access-order + removeEldestEntry invariant and its synchronization
 * live in a single place.
 *
 * Locking discipline: `get`/`put`/`clear` each hold the monitor only
 * for the map operation — callers must CREATE expensive values outside
 * and reconcile losers via `put`'s returned previous value (see
 * [[graft.write.DeletionVectors.broadcastFor]]), never compute under
 * the lock.
 */
final class LruCache[K, V](max: Int, onEvict: (K, V) => Unit = (_: K, _: V) => ()) {

  private val map = new java.util.LinkedHashMap[K, V](16, 0.75f, /* accessOrder = */ true) {
    override def removeEldestEntry(e: java.util.Map.Entry[K, V]): Boolean = {
      val evict = size() > max
      if (evict) onEvict(e.getKey, e.getValue)
      evict
    }
  }

  def get(k: K): Option[V] = map.synchronized(Option(map.get(k)))

  /** Insert and return the REPLACED value, if any — the replaced value
   * is NOT passed to `onEvict`; the caller decides (it may be the very
   * value a concurrent racer just handed out). */
  def put(k: K, v: V): Option[V] = map.synchronized(Option(map.put(k, v)))

  def clear(): Unit = map.synchronized(map.clear())

}
