package graft

import org.apache.spark.sql.SparkSession

/** Per-session memo cache for derived frames (hierarchy dims, dedup
  * components).
  *
  * A WeakHashMap keyed on the session can never reclaim these entries:
  * the cached values hold their SparkSession through their query
  * plans, so the value strongly reaches the key, the key is never
  * weakly reachable, and the "weak" map pins every session (and its
  * cached plans) for the JVM lifetime — the classic WeakHashMap
  * value→key pin. This cache is strong and instead SWEEPS on access:
  * any cache touch drops every entry whose SparkContext has stopped,
  * so a dead session's plans unpin at the next use from a live one.
  */
final class SessionCache[K, V] {
  private val m = new java.util.concurrent.ConcurrentHashMap[SparkSession,
    scala.collection.concurrent.TrieMap[K, V]]()
  // insertion order for the bounded-eviction path below
  private val order = new java.util.concurrent.ConcurrentLinkedQueue[SparkSession]()
  private val maxSessions = 16

  def apply(spark: SparkSession, key: K)(build: => V): V = {
    val it = m.keySet.iterator
    while (it.hasNext) if (it.next().sparkContext.isStopped) it.remove()
    if (m.get(spark) == null) {
      // isStopped can't see sessions sharing a live context
      // (newSession()/cloneSession): bound the tracked-session count
      // so a per-request-session service degrades to recompute for
      // the oldest sessions instead of growing the heap forever
      var oldest = if (m.size >= maxSessions) order.poll() else null
      while (oldest != null) {
        if (oldest ne spark) m.remove(oldest)
        oldest = if (m.size >= maxSessions) order.poll() else null
      }
      order.add(spark)
    }
    m.computeIfAbsent(spark,
      _ => scala.collection.concurrent.TrieMap.empty[K, V])
      .getOrElseUpdate(key, build)
  }
}
