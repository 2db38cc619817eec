package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

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
  * committed index itself is never touched.) */
object IndexStore {

  /** True iff a committed index exists at `path` (its `_SUCCESS` marker
    * is visible through the path's own filesystem). */
  def isCommitted(spark: SparkSession, path: String): Boolean = {
    val marker = new Path(path, "_SUCCESS")
    val fs = marker.getFileSystem(spark.sessionState.newHadoopConf())
    fs.exists(marker)
  }

  /** Build-if-absent with atomic publish. `build` receives a scratch
    * path and must leave a complete artifact there (e.g. a parquet
    * write); returns `path`, which is committed when this returns —
    * either by this call's rename or by a concurrent winner's. */
  def ensure(spark: SparkSession, path: String)(build: String => Unit): String = {
    if (!isCommitted(spark, path)) {
      val target = new Path(path)
      val fs = target.getFileSystem(spark.sessionState.newHadoopConf())
      val scratch = new Path(
        path + ".build-" + java.util.UUID.randomUUID().toString.take(8))
      build(scratch.toString)
      // a target directory WITHOUT the marker is a stale partial write
      // (e.g. a crashed pre-IndexStore builder): replace it, don't fail
      // behind it — isCommitted was false, so nobody can be reading it
      if (fs.exists(target) && !isCommitted(spark, path)) fs.delete(target, true)
      // guard on scratch existing: a build closure that wrote nothing
      // must reach the loud require below, not a rename FNF
      val published = fs.exists(scratch) &&
        !fs.exists(target) && fs.rename(scratch, target)
      if (!published && fs.exists(scratch)) fs.delete(scratch, true)
      // posix-like rename may have moved the scratch INSIDE a target that
      // appeared between the exists check and the rename — drop the stray
      val stray = new Path(target, scratch.getName)
      if (fs.exists(stray)) fs.delete(stray, true)
      require(isCommitted(spark, path),
        s"index build at $path produced no committed artifact " +
          "(the build closure must write a _SUCCESS-marked directory)")
    }
    path
  }
}
