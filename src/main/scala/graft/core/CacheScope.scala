package graft.core

import scala.collection.mutable.ArrayBuffer

/** Registry for storage held on behalf of lazily-returned query results.
  *
  * Several queries persist an intermediate frame that the returned
  * (lazy) DataFrame reads from more than one operator — LSH shingle
  * frames, simhash projections, IVF cell assignments — and the
  * connected-components variants return a frame backed by a persisted
  * row RDD (their lineage-truncation mechanism). None of these can be
  * unpersisted before the caller's terminal action, so a bare library
  * call would otherwise hold the cache for the session's lifetime
  * (`spark.catalog.clearCache()` frees the Dataset-level caches but NOT
  * the RDD-level persists behind the CC results).
  *
  * Queries register every such persist here; callers release with
  * [[releaseAll]] after consuming results. `Verify` and `Bench` call it
  * between queries. Releasing is always safe — an unpersisted frame
  * recomputes from lineage on the next action (slow, never wrong) — and
  * double-release is a no-op.
  */
object CacheScope {
  private val cleanups = ArrayBuffer.empty[() => Unit]

  /** Register a persisted Dataset for later [[releaseAll]]; returns it. */
  def track[T](ds: org.apache.spark.sql.Dataset[T]): org.apache.spark.sql.Dataset[T] =
    synchronized { cleanups += (() => { ds.unpersist(false); () }); ds }

  /** Register a persisted RDD (the CC results' backing storage). */
  def trackRdd[T](rdd: org.apache.spark.rdd.RDD[T]): org.apache.spark.rdd.RDD[T] =
    synchronized { cleanups += (() => { rdd.unpersist(false); () }); rdd }

  /** Release every tracked frame/RDD (non-blocking). Failures are
    * swallowed: a frame whose session already stopped has nothing left
    * to free. */
  def releaseAll(): Unit = synchronized {
    cleanups.foreach(f => try f() catch { case _: Throwable => () })
    cleanups.clear()
  }
}
