package graft.queries

import org.apache.spark.sql.SparkSession

/** Per-SparkSession memo for expensive shared query artifacts (exact-kNN
  * ground truth, PQ codebooks/codes, built indexes). Keyed by the SESSION
  * OBJECT through a WeakHashMap — an identity hash can be reused after a
  * stopped session is GC'd, so a string key of identityHashCode could
  * serve a cached DataFrame bound to a dead SparkSession (ADVICE r5).
  * Entries disappear with the session (weak key), and any entry whose
  * underlying SparkContext has stopped is purged on the next access so a
  * long-lived process never pins dead sessions' cached data. */
private[graft] final class SessionMemo[V] {
  private val map =
    new java.util.WeakHashMap[SparkSession, collection.mutable.Map[String, V]]()

  def getOrElseUpdate(s: SparkSession, key: String)(mk: => V): V =
    synchronized {
      val it = map.entrySet().iterator()
      while (it.hasNext) if (it.next().getKey.sparkContext.isStopped) it.remove()
      map.computeIfAbsent(s, _ => collection.mutable.Map.empty[String, V])
        .getOrElseUpdate(key, mk)
    }
}
