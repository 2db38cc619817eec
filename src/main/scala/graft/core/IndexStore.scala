package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Commit protocol for persisted index artifacts (the d9 near-dup index,
  * the y7 ANN index): Hadoop-`FileSystem`-addressed, so an index path
  * may live on any filesystem the session can reach — `file:`, `hdfs://`,
  * `s3a://` — not just the driver-local disk a `java.io.File` check
  * could see.
  *
  * Committed = the directory carries the `_SUCCESS` marker Spark's
  * parquet committer writes. [[ensure]] adds race safety for the
  * build-if-absent shape: the build runs against a scratch directory
  * next to the target and is PUBLISHED with one rename, so a reader can
  * never observe a half-written index, and two concurrent first callers
  * race benignly — one rename wins, the loser deletes its scratch and
  * reads the winner's copy. (On filesystems whose rename moves the
  * source INTO an existing destination directory instead of failing,
  * the loser's stray child directory is cleaned up after the fact; the
  * committed index itself is never touched.)
  *
  * A plain filesystem offers no compare-and-swap, so the protocol is
  * best-effort against ARBITRARY interleavings: the one residual window
  * is two builders both observing the same STALE uncommitted target
  * (a crashed pre-commit write) and one deleting it microseconds after
  * the other replaced it — a production deployment that must exclude
  * even that uses per-version index directories or a coordination
  * service, both out of scope for a library primitive. */
object IndexStore {

  /** True iff a committed index exists at `path` (its `_SUCCESS` marker
    * is visible through the path's own filesystem). */
  def isCommitted(spark: SparkSession, path: String): Boolean = {
    val marker = new Path(path, "_SUCCESS")
    val fs = marker.getFileSystem(spark.sessionState.newHadoopConf())
    fs.exists(marker)
  }

  /** Read a committed index — the loud-fail read half shared by every
    * index consumer (batch d9, streaming ingest screen, y7 ANN): an
    * uncommitted or missing index raises with the builder to run,
    * never returns a partial scan. */
  def read(spark: SparkSession, path: String, what: String = "index",
           builder: String = "IndexStore.ensure"): DataFrame = {
    require(isCommitted(spark, path),
      s"no committed $what at $path — build one with $builder")
    spark.read.parquet(path)
  }

  /** Build-if-absent with atomic publish. `build` receives a scratch
    * path and must leave a complete artifact there (e.g. a parquet
    * write); returns `path`, which is committed when this returns —
    * either by this call's rename or by a concurrent winner's. A build
    * that throws or writes nothing never leaves a scratch directory
    * behind. */
  def ensure(spark: SparkSession, path: String)(build: String => Unit): String = {
    if (!isCommitted(spark, path)) {
      val target = new Path(path)
      val fs = target.getFileSystem(spark.sessionState.newHadoopConf())
      // a target directory WITHOUT the marker is a stale partial write
      // (e.g. a crashed pre-commit builder): clear it UP FRONT — before
      // the build, where a concurrent committer has had no time to
      // appear — rather than after, where the check-to-delete window
      // would span the whole build (see the class doc's residual-window
      // note). Re-checked immediately before the delete.
      if (fs.exists(target) && !isCommitted(spark, path)) fs.delete(target, true)
      val scratch = new Path(
        path + ".build-" + java.util.UUID.randomUUID().toString.take(8))
      try {
        build(scratch.toString)
        // guard on scratch existing: a build closure that wrote nothing
        // must reach the loud require below, not a rename FNF. A
        // committed target appearing during the build means a
        // concurrent builder won — lose gracefully, never touch it.
        if (fs.exists(scratch) && !fs.exists(target))
          fs.rename(scratch, target)
      } finally {
        // loser/failed-build cleanup (after a successful rename the
        // scratch no longer exists); also drop the stray child a
        // posix-like rename may have left INSIDE a target that appeared
        // between the exists check and the rename
        if (fs.exists(scratch)) fs.delete(scratch, true)
        val stray = new Path(target, scratch.getName)
        if (fs.exists(stray)) fs.delete(stray, true)
      }
      require(isCommitted(spark, path),
        s"index build at $path produced no committed artifact " +
          "(the build closure must write a _SUCCESS-marked directory)")
    }
    path
  }
}
