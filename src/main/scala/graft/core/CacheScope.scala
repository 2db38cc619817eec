package graft.core

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.SparkSession

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
  *
  * Concurrency contract: the registry is process-global, so a bare
  * [[releaseAll]] drops EVERY tracked persist across all sessions —
  * including another in-flight query's intermediates (correct but a
  * recompute cliff; an RDD-backed CC result would replay its whole
  * iterative cascade on its next action). Entries are therefore keyed
  * by owning [[SparkSession]]: a concurrent library caller should use
  * [[release]]`(session)` to free only its own session's persists and
  * leave other sessions' storage alone. Single-pipeline harnesses
  * (Verify/Bench — one query in flight at a time) use the global form.
  */
object CacheScope {
  private val cleanups = ArrayBuffer.empty[(SparkSession, () => Unit)]

  /** Register a persisted Dataset for later release (owner inferred from
    * the Dataset's session); returns it. */
  def track[T](ds: org.apache.spark.sql.Dataset[T]): org.apache.spark.sql.Dataset[T] =
    synchronized {
      cleanups += ((ds.sparkSession, () => { ds.unpersist(false); () })); ds
    }

  /** Register a persisted RDD (the CC results' backing storage) under
    * the session that produced it. */
  def trackRdd[T](rdd: org.apache.spark.rdd.RDD[T],
                  owner: SparkSession): org.apache.spark.rdd.RDD[T] =
    synchronized { cleanups += ((owner, () => { rdd.unpersist(false); () })); rdd }

  /** Release every tracked frame/RDD across all sessions (non-blocking).
    * Failures are swallowed: a frame whose session already stopped has
    * nothing left to free. */
  def releaseAll(): Unit = synchronized {
    cleanups.foreach { case (_, f) => try f() catch { case _: Throwable => () } }
    cleanups.clear()
  }

  /** Release only the persists registered by queries running on
    * `session` — the concurrent-caller form of [[releaseAll]]. */
  def release(session: SparkSession): Unit = synchronized {
    val (mine, others) = cleanups.partition(_._1 eq session)
    mine.foreach { case (_, f) => try f() catch { case _: Throwable => () } }
    cleanups.clear()
    cleanups ++= others
  }
}
