package graft

import org.apache.spark.sql.SparkSession

/** Session-scoped memoization used by the table catalog and the IVF/centroid
  * index caches.
  *
  * Keys are the session OBJECT through a weak-keyed map — not
  * `System.identityHashCode`, which is neither unique nor stable across GC
  * (a recycled hash would hand a later session a DataFrame bound to a dead
  * SparkContext, or silently skip one-time session setup). Weak keys also
  * give the correct lifetime for free: a stopped, unreferenced session drops
  * its whole cache map.
  */
object SessionCache {

  private val maps =
    new java.util.WeakHashMap[SparkSession, java.util.concurrent.ConcurrentHashMap[String, AnyRef]]()

  private def of(s: SparkSession): java.util.concurrent.ConcurrentHashMap[String, AnyRef] =
    maps.synchronized {
      var m = maps.get(s)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()
        maps.put(s, m)
      }
      m
    }

  /** Compute `f` once per (session, key); later calls return the cached value. */
  def getOrCompute[T <: AnyRef](s: SparkSession, key: String)(f: => T): T =
    of(s).computeIfAbsent(key, _ => f).asInstanceOf[T]

  /** True exactly once per (session, key) — one-time session setup guard. */
  def once(s: SparkSession, key: String): Boolean =
    of(s).putIfAbsent(key, java.lang.Boolean.TRUE) == null
}
