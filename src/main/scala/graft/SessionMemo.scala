package graft

import org.apache.spark.sql.SparkSession

/** Compute-once-per-(session, key) memo — the idiom behind warehouse
  * DDL, index builds, and fixture lakes (one build per session per
  * scale-factor dir), extracted so the locking discipline lives in ONE
  * place. Weak session keys: a stopped session's entry is collectable.
  * The global lock only guards the per-session map lookup; the build
  * runs under the per-session lock so unrelated sessions never
  * serialize on one build. Only a build that SUCCEEDED memoizes — a
  * failed attempt can retry (callers keep their bodies idempotent). */
private[graft] final class SessionMemo[V] {
  private val m = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, java.util.Map[String, V]]())

  def getOrBuild(s: SparkSession, key: String)(build: => V): V = {
    val inner = m.synchronized {
      m.computeIfAbsent(s, _ => new java.util.HashMap[String, V]())
    }
    inner.synchronized {
      Option(inner.get(key)).getOrElse {
        val v = build
        inner.put(key, v)
        v
      }
    }
  }
}
