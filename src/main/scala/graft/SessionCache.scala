package graft

import org.apache.spark.sql.SparkSession

/** Weak-keyed per-session cache for session-bound artifacts (trained ANN
  * codebooks, checkpointed corpora, armed cloned sessions).
  *
  * Keying on the session OBJECT via a `WeakHashMap` gives what a string key
  * derived from `System.identityHashCode` cannot: no collisions after the
  * session is GC'd and the hash is reused (a new session reusing the hash
  * would silently see the dead session's artifacts), plus eviction when the
  * session dies. (`sessionUUID` would also be collision-free but is not on
  * the public `sql.SparkSession` API in Spark 4.x.) Caveat on eviction: a
  * cached VALUE that itself references its session (e.g. a DataFrame) pins
  * the weak key, so such entries live until the JVM exits — acceptable for
  * a bench/test harness; correctness only needs collision-freedom.
  *
  * The outer map is lock-guarded only for the per-session bucket lookup;
  * value computation runs outside the lock on the concurrent inner map, so
  * one session training a codebook never blocks another session's lookups.
  */
final class SessionCache[V] {
  private val buckets =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[String, V]]()

  private def bucket(s: SparkSession) = buckets.synchronized {
    var b = buckets.get(s)
    if (b == null) {
      b = scala.collection.concurrent.TrieMap.empty[String, V]
      buckets.put(s, b)
    }
    b
  }

  def getOrElseUpdate(s: SparkSession, key: String)(v: => V): V =
    bucket(s).getOrElseUpdate(key, v)
}
