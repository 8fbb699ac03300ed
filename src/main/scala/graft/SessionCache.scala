package graft

import org.apache.spark.sql.SparkSession

/** Session-scoped memoization used by the table catalog and the IVF/centroid
  * index caches.
  *
  * Keys are the session OBJECT through a weak-keyed map — not
  * `System.identityHashCode`, which is neither unique nor stable across GC
  * (a recycled hash would hand a later session a DataFrame bound to a dead
  * SparkContext, or silently skip one-time session setup).
  *
  * Lifetime: cached values (DataFrames) strongly reference their session, so
  * weak keys alone cannot collect an entry (the classic WeakHashMap
  * value→key pitfall); eviction is explicit instead — a listener clears a
  * session's entry when its SparkContext ends. Sessions sharing one
  * long-lived context (`newSession()`) keep their entries for the context's
  * life: bounded by (sessions × sf dirs), a handful in any harness.
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
        s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
          override def onApplicationEnd(
              end: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit =
            maps.synchronized { maps.remove(s) }
        })
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
