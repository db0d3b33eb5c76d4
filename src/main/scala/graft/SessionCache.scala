package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Owned lifecycle for operator-INTERNAL `cache()` pins (r17 verdict
  * #4). Operators pin derivations that are read by ≥2 consumers of
  * the plan they return (minhash signature frames, ANN shortlists,
  * pHash band frames, skyline point sets): without the pin the
  * upstream pipeline re-runs per consumer (Spark has no cross-branch
  * subplan reuse), but a bare `.cache()` floats free — nothing ever
  * unpersists it, and across a long-lived interactive session each
  * distinct input accumulates block-manager storage forever (the
  * documented footgun this object retires).
  *
  * Every internal pin is registered here per session instead:
  *   - [[pin]] = `cache()` + register (semantics otherwise identical
  *     to the raw pin — same frame back, CacheManager still dedupes
  *     repeat plans);
  *   - the registry is BOUNDED (`maxPins`, insertion order): past the
  *     bound the oldest pin is unpersisted and its consumers simply
  *     recompute — storage can no longer grow without limit;
  *   - [[releaseAll]] is the service-lifecycle hook: unpersist and
  *     forget everything this session pinned (frames stay usable);
  *   - stopped sessions are swept on access (their block-manager
  *     state died with the context — nothing to unpersist).
  *
  * The registry-RESULT caches ([[SessionCache]] instances with
  * `onEvict = unpersist`, HierarchyDimension's `unpersistAll`) keep
  * their own ownership; this covers the pins INSIDE operator bodies.
  */
object SessionPins {
  private val maxPins = sys.env.get("GRAFT_MAX_SESSION_PINS")
    .map(_.toInt).getOrElse(256)

  // `dead` closes the pin/releaseAll race: releaseAll removes the
  // queue from the map and THEN (under the lock) marks it dead and
  // drains it. A pin that grabbed the old queue before the removal
  // either lands inside the drained set (released with the rest) or
  // observes `dead` and retries into a fresh queue — a cached frame
  // can never end up registered nowhere (the silent re-leak the
  // registry exists to prevent).
  private final class PinQueue {
    var dead = false
    val q = new java.util.ArrayDeque[DataFrame]()
  }
  private val m = new java.util.concurrent.ConcurrentHashMap[
    SparkSession, PinQueue]()

  private def quietUnpersist(df: DataFrame): Unit =
    try { df.unpersist(); () }
    catch { case scala.util.control.NonFatal(_) => () }

  /** cache() + register, returning the same frame. */
  def pin(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val it = m.keySet.iterator
    while (it.hasNext) if (it.next().sparkContext.isStopped) it.remove()
    df.cache()
    var registered = false
    while (!registered) {
      val pq = m.computeIfAbsent(spark, _ => new PinQueue)
      registered = pq.synchronized {
        if (pq.dead) false // racing releaseAll drained this queue; retry
        else {
          pq.q.addLast(df)
          // oldest-first eviction: unpersist releases the executor
          // blocks; the frame itself stays usable (recompute on next
          // read). Note CacheManager unpersists by PLAN equality — an
          // evicted pin sharing its plan with a newer one drops the
          // shared entry, which is the conservative (storage-bounding)
          // direction.
          while (pq.q.size > maxPins) quietUnpersist(pq.q.pollFirst())
          true
        }
      }
    }
    df
  }

  /** Unpersist and forget every pin taken in `spark` — idempotent;
    * pinned frames stay usable, they just recompute. Safe to race
    * with concurrent [[pin]]s: each pin either drains here or
    * re-registers in a fresh queue.
    */
  def releaseAll(spark: SparkSession): Unit = {
    val pq = m.remove(spark)
    if (pq != null) pq.synchronized {
      pq.dead = true
      if (!spark.sparkContext.isStopped) pq.q.forEach(quietUnpersist)
      pq.q.clear()
    }
  }

  private[graft] def pinCount(spark: SparkSession): Int = {
    val pq = m.get(spark)
    if (pq == null) 0 else pq.synchronized(pq.q.size)
  }
}

/** Stored-artifact materialization (optimization r21): cache, force,
  * and re-root at the `InMemoryRelation` leaf.
  *
  * The session-cached artifacts (graph edges/adjacency/labels/pr7,
  * hierarchy dims, dedup components, s13's k-NN graph) are built once
  * and consumed by many registry entries. With a bare `.cache()` each
  * consumer still re-analyzes the artifact's FULL build lineage —
  * trees whose self-referencing unions/joins duplicate subplans
  * exponentially (g8's final plan carried ~1.5k Exchange nodes; its
  * floor was Catalyst planning, not execution). [[leaf]] truncates
  * the stored frame to its materialized `InMemoryRelation`, which
  * keeps columnar storage AND the accurate post-materialization size
  * statistics (broadcast-join decisions unchanged — a `LogicalRDD`
  * local checkpoint loses them and flips small-side broadcasts to
  * sort-merge joins).
  *
  * Lifecycle: the underlying cache is registered with [[SessionPins]]
  * (bounded, released by `releaseAll`), because the leaf frame's own
  * `unpersist()` no longer matches the original plan in the
  * CacheManager. An unpersisted leaf stays CORRECT — the
  * `InMemoryRelation` recomputes from its retained physical child —
  * it just loses the speedup.
  */
object Materialize {
  // leaf → raw frame, so [[release]] can unpersist the ORIGINAL cached
  // plan (the leaf's own unpersist() no longer matches the CacheManager
  // entry — ADVICE r21 #2: registry caches evicting leaves silently
  // stopped releasing executor storage). Weak keys: once a registry
  // cache drops the leaf, the entry clears with it; values (raw
  // frames) don't reach their keys, so the classic WeakHashMap
  // value→key pin doesn't apply.
  private val raws =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[DataFrame, DataFrame]())

  def leaf(df: DataFrame): DataFrame = {
    SessionPins.pin(df)
    df.count()
    val l = org.apache.spark.sql.GraftColumnBridge.cachedLeaf(df)
    if (l ne df) raws.put(l, df)
    l
  }

  /** Unpersist a [[leaf]]'s underlying cache entry (falls back to a
    * plain `unpersist()` for frames that aren't leaves) — the correct
    * `onEvict` for registry caches that store materialized leaves. */
  def release(df: DataFrame): Unit = {
    val raw = raws.remove(df)
    try { (if (raw != null) raw else df).unpersist(); () }
    catch { case scala.util.control.NonFatal(_) => () }
  }
}

/** Per-session memo cache for derived frames (hierarchy dims, dedup
  * components).
  *
  * A WeakHashMap keyed on the session can never reclaim these entries:
  * the cached values hold their SparkSession through their query
  * plans, so the value strongly reaches the key, the key is never
  * weakly reachable, and the "weak" map pins every session (and its
  * cached plans) for the JVM lifetime — the classic WeakHashMap
  * value→key pin. This cache is strong and instead SWEEPS on access:
  * any cache touch drops every entry whose SparkContext has stopped —
  * from both the map AND the insertion-order queue — so a dead
  * session's plans unpin at the next use from a live one.
  *
  * @param onEvict called once per value when a LIVE session is evicted
  *                by the session bound (sessions sharing one context);
  *                use it to `unpersist()` cached DataFrames so eviction
  *                bounds executor storage, not just the driver map.
  *                Not called for stopped sessions (their block-manager
  *                state died with the context).
  */
final class SessionCache[K, V](onEvict: V => Unit = (_: V) => ()) {
  private val m = new java.util.concurrent.ConcurrentHashMap[SparkSession,
    scala.collection.concurrent.TrieMap[K, V]]()
  // insertion order for the bounded-eviction path below
  private val order = new java.util.concurrent.ConcurrentLinkedQueue[SparkSession]()
  private val maxSessions = 16

  private def safeEvict(v: V): Unit =
    try onEvict(v) catch { case scala.util.control.NonFatal(_) => () }

  def apply(spark: SparkSession, key: K)(build: => V): V = {
    val it = m.keySet.iterator
    while (it.hasNext) if (it.next().sparkContext.isStopped) it.remove()
    order.removeIf(s => s.sparkContext.isStopped)
    if (!m.containsKey(spark)) {
      // isStopped can't see sessions sharing a live context
      // (newSession()/cloneSession): bound the tracked-session count
      // so a per-request-session service degrades to recompute for
      // the oldest sessions instead of growing the heap forever
      var continue = true
      while (continue && m.size >= maxSessions) {
        val oldest = order.poll()
        if (oldest == null) continue = false
        else if (oldest eq spark) {
          // re-enqueue only if no racing computeIfAbsent already put a
          // copy back: a duplicate queue entry would let a later
          // eviction pass poll the stale copy and evict (and
          // unpersist) a live session early
          if (!order.contains(spark)) order.add(spark)
          continue = false
        }
        else if (order.contains(oldest)) {
          // stale duplicate: a newer queue entry still tracks this
          // session — dropping the old copy without evicting keeps
          // each live session's cache intact
        } else {
          val evicted = m.remove(oldest)
          if (evicted != null) evicted.values.foreach(safeEvict)
        }
      }
    }
    // order.add inside the mapping function: ConcurrentHashMap runs it
    // atomically at most once per key, so a session is enqueued exactly
    // once (two racing threads can't double-enqueue and trigger a
    // premature eviction of a live session later)
    val tm = m.computeIfAbsent(spark,
      _ => {
        order.add(spark)
        scala.collection.concurrent.TrieMap.empty[K, V]
      })
    val v = tm.getOrElseUpdate(key, build)
    // eviction race: a concurrent bounded eviction can remove this
    // session's map while the build above is still running — the fresh
    // value would then be untracked and its onEvict never fire (the
    // exact leak this class exists to prevent). Re-publish the map
    // (the session is demonstrably live; eviction picked the wrong
    // victim); if a replacement map already won the slot, adopt the
    // value into it, releasing ours when a racer's build got there
    // first. If the session was evicted AGAIN in the meantime, release
    // the value outright — the caller still holds a usable frame, it
    // just recomputes instead of reading cache.
    if (m.get(spark) ne tm) {
      if (m.putIfAbsent(spark, tm) == null) order.add(spark)
      else m.get(spark) match {
        case null => safeEvict(v)
        case cur =>
          val adopted = cur.getOrElseUpdate(key, v)
          if (!adopted.asInstanceOf[AnyRef].eq(v.asInstanceOf[AnyRef]))
            safeEvict(v)
      }
    }
    v
  }
}
