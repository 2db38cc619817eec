package graft

import graft.core.CacheScope
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Concurrency contract of [[graft.core.CacheScope]]: entries are keyed
  * by owning SparkSession, so one library caller's cleanup cannot evict
  * another session's in-flight persisted intermediates (the CC results
  * are RDD-backed — re-materializing them replays the whole iterative
  * cascade, so a cross-session eviction is correct but a large
  * recompute cliff). */
class CacheScopeSpec extends SparkTestBase {

  test("release(session) frees only that session's tracked persists") {
    val sessionA = spark.newSession()
    val sessionB = spark.newSession()
    val dfA = CacheScope.track(sessionA.range(1000).toDF("id").persist())
    val dfB = CacheScope.track(sessionB.range(2000).toDF("id").persist())
    dfA.count(); dfB.count() // materialize both caches
    assert(dfA.storageLevel !== StorageLevel.NONE)
    assert(dfB.storageLevel !== StorageLevel.NONE)

    CacheScope.release(sessionA)
    assert(dfA.storageLevel === StorageLevel.NONE,
      "own session's persist must be freed")
    assert(dfB.storageLevel !== StorageLevel.NONE,
      "another session's persist must stay hot after a concurrent release")

    // idempotent: releasing again (or releasing B) is safe
    CacheScope.release(sessionA)
    CacheScope.release(sessionB)
    assert(dfB.storageLevel === StorageLevel.NONE)
  }

  test("release(session) frees the session's tracked RDDs and leaves the other's") {
    val sessionA = spark.newSession()
    val sessionB = spark.newSession()
    val rddA = CacheScope.trackRdd(
      sessionA.range(100).toDF("id").rdd.persist(StorageLevel.MEMORY_AND_DISK),
      sessionA)
    val rddB = CacheScope.trackRdd(
      sessionB.range(100).toDF("id").rdd.persist(StorageLevel.MEMORY_AND_DISK),
      sessionB)
    rddA.count(); rddB.count()

    CacheScope.release(sessionA)
    assert(rddA.getStorageLevel === StorageLevel.NONE)
    assert(rddB.getStorageLevel !== StorageLevel.NONE)
    CacheScope.releaseAll() // the single-pipeline harness form drops the rest
    assert(rddB.getStorageLevel === StorageLevel.NONE)
  }

  test("a query's CC result registered in one session survives another session's release") {
    // end-to-end shape: connectedComponents returns a frame backed by a
    // persisted row RDD registered under the session that produced it
    val sessionA = spark.newSession()
    val sessionB = spark.newSession()
    import sessionA.implicits._
    val pairsA = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a_id", "b_id")
    val ccA = graft.ext.Dedup.connectedComponents(pairsA)
    val before = ccA.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    CacheScope.release(sessionB) // a concurrent caller cleaning up
    // A's result frame is still served from its persisted RDD and
    // unchanged (a recompute would also be CORRECT — the point here is
    // the registry didn't throw A's storage away: re-collect is cheap
    // and equal)
    val after = ccA.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after === before)
    assert(after === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    CacheScope.release(sessionA)
  }
}
