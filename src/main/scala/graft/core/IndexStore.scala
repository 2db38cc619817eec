package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Commit protocol for persisted index artifacts (the d9 near-dup index,
  * the y7 ANN index): Hadoop-`FileSystem`-addressed, so an index path
  * may live on any filesystem the session can reach — `file:`, `hdfs://`,
  * `s3a://` — not just the driver-local disk a `java.io.File` check
  * could see.
  *
  * Committed = the directory carries the `_SUCCESS` marker. [[ensure]]
  * adds race safety for the build-if-absent shape with a MARKER-LAST
  * publish: the build runs against a scratch directory next to the
  * target, the scratch's own `_SUCCESS` is removed, the DATA is moved
  * to the target with one rename, and only then is the marker created
  * at the target — so `isCommitted` implies the data files are fully
  * visible even on stores whose rename is a non-atomic per-file copy
  * (s3a://; on rename-atomic filesystems like file: and hdfs:// the
  * whole publish is atomic anyway). Two concurrent first callers race
  * benignly — one rename wins, the loser deletes its scratch and reads
  * the winner's copy. (On filesystems whose rename moves the source
  * INTO an existing destination directory instead of failing, the
  * stray child is detected, removed, and no marker is written by the
  * loser; the committed index itself is never touched.)
  *
  * Stale-target recovery (a crashed pre-commit write left a markerless
  * target) renames the target ASIDE to `<path>.stale-<uuid>` and
  * deletes the renamed copy, so a concurrent builder's commit can
  * never be the victim of the delete itself. A plain filesystem offers
  * no compare-and-swap, so one residual window remains on CAS-free
  * stores: a racer publishing in the instant between the stale
  * re-check and the aside-rename — a production deployment that must
  * exclude even that uses per-version index directories or a
  * coordination service, both out of scope for a library primitive. */
object IndexStore {

  /** Count of [[ensure]] calls in THIS JVM that actually ran their
    * build (found no committed artifact). A harness that reports this
    * beside its timings makes artifact-cold sessions legible in the
    * record itself: a run whose fixtures were all standing reads 0,
    * while a fresh-tmpdir session reads the full build set — the
    * "measurement-aftermath" class (heap/page-cache pressure from
    * corpus-sized builds minutes before the timed window) that
    * produced the 88.6 s first d14b decade row and round 13's
    * healed-32 degraded mint. Counts build closures that ran to
    * COMPLETION in this JVM (race losers included — they paid the
    * cost); a closure that threw is not counted. Monotone, never
    * reset. */
  private val buildCounter = new java.util.concurrent.atomic.AtomicLong(0)
  def buildsThisJvm: Long = buildCounter.get()

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

  /** Build-if-absent with marker-last publish. `build` receives a
    * scratch path and must leave a complete `_SUCCESS`-marked artifact
    * there (e.g. a parquet write); returns `path`, which is committed
    * when this returns — either by this call's publish or by a
    * concurrent winner's. A build that throws or writes nothing never
    * leaves a scratch directory behind. */
  def ensure(spark: SparkSession, path: String)(build: String => Unit): String = {
    if (!isCommitted(spark, path)) {
      val target = new Path(path)
      val fs = target.getFileSystem(spark.sessionState.newHadoopConf())
      // a target directory WITHOUT the marker is a stale partial write
      // (e.g. a crashed pre-commit builder): clear it UP FRONT — before
      // the build, where a concurrent committer has had no time to
      // appear. Recovery is rename-ASIDE-then-delete (never a direct
      // delete of the live target path), so the only operation a racer's
      // freshly-committed index could lose to is the aside-rename in the
      // instant after the re-check — the delete itself always eats our
      // private .stale copy (see the class doc's residual-window note).
      if (fs.exists(target) && !isCommitted(spark, path)) {
        val aside = new Path(
          path + ".stale-" + java.util.UUID.randomUUID().toString.take(8))
        if (fs.rename(target, aside)) fs.delete(aside, true)
      }
      val scratch = new Path(
        path + ".build-" + java.util.UUID.randomUUID().toString.take(8))
      val scratchMarker = new Path(scratch, "_SUCCESS")
      try {
        build(scratch.toString)
        // counted AFTER the closure returns: the marker measures builds
        // whose corpus-sized work actually ran in this JVM (race losers
        // included — they paid the cost that pressures the session), but
        // a build that THREW before doing its work no longer inflates
        // the artifact-cold signal (r13 advisor)
        buildCounter.incrementAndGet()
        // Marker-last publish. The scratch must itself be committed (a
        // build that wrote nothing or half-crashed reaches the loud
        // require below instead of publishing garbage). Drop the
        // scratch's own marker BEFORE moving the data, then mark the
        // target only after the data rename — on a store whose rename
        // copies per file (s3a://), a reader polling isCommitted can
        // never pass while data files are still in flight. A committed
        // target appearing during the build means a concurrent builder
        // won — lose gracefully, never touch it.
        if (fs.exists(scratchMarker) && !fs.exists(target)) {
          fs.delete(scratchMarker, false)
          if (fs.rename(scratch, target)) {
            // posix-like renames move the source INTO a directory that
            // appeared between the exists check and the rename; detect
            // via the stray child and leave marking to the real winner
            val stray = new Path(target, scratch.getName)
            if (fs.exists(stray)) fs.delete(stray, true)
            else fs.create(new Path(target, "_SUCCESS"), false).close()
          }
        }
      } finally {
        // loser/failed-build cleanup (after a successful publish the
        // scratch no longer exists)
        if (fs.exists(scratch)) fs.delete(scratch, true)
      }
      // a concurrent winner may still be between its data rename and its
      // marker write — give that tiny window a bounded grace before the
      // loud fail. The default 2 s covers local/HDFS stores; on a slow
      // object store a winner's marker create can lag longer, so the
      // grace is a session conf rather than a constant (a spuriously
      // loud-failing loser is the alternative).
      val graceMs = spark.conf
        .get("spark.graft.index.publishGraceMs", "2000").toLong
      val deadline = System.currentTimeMillis() + graceMs
      while (!isCommitted(spark, path) &&
             System.currentTimeMillis() < deadline) {
        Thread.sleep(100)
      }
      require(isCommitted(spark, path),
        s"index build at $path produced no committed artifact " +
          "(the build closure must write a _SUCCESS-marked directory)")
    }
    path
  }

  /** Rebuild-and-swap: always runs `build` against a scratch path and
    * atomically replaces whatever sits at `path` — the maintenance half
    * of the protocol ([[ensure]] is build-if-absent; this is the
    * periodic-rewrite primitive index compaction needs). The old
    * artifact stays fully readable for the entire build; the swap
    * window itself (old renamed aside → new renamed in → marker
    * created) is the one interval where `isCommitted` is false, and
    * every reader is loud-fail by contract, so a concurrent reader sees
    * "no committed index" with the builder to run — never a torn mix of
    * old and new files. Marker-last still holds on per-file-copy stores
    * (s3a://): the new data finishes moving before the marker appears.
    *
    * Single-maintainer contract, deliberately weaker than [[ensure]]'s
    * benign race: two concurrent `replace` calls (or a replace racing an
    * ensure-build) are last-swap-wins and may delete each other's
    * output — run maintenance rewrites from one scheduled job, the same
    * discipline any table-format compaction demands. A failed build
    * leaves the old artifact committed and untouched.
    *
    * Crash recovery (operator procedure): a maintainer process killed
    * between the aside-rename and the publish leaves nothing committed
    * at `path` and the old artifact intact in a `<path>.old-<uuid>`
    * sibling — neither this method nor [[ensure]]'s stale recovery
    * will find it, deliberately (guessing which sibling is canonical
    * is not a library decision). To recover: confirm `path` has no
    * `_SUCCESS`, remove any `<path>.build-*` leftovers, rename the
    * single `<path>.old-*` directory back to `path` — it still carries
    * its original `_SUCCESS`. A failed SWAP inside a live call needs no
    * procedure: the restore is automatic, and if the restore rename
    * itself fails the aside directory is PRESERVED (never cleaned up)
    * and named in the thrown exception. */
  def replace(spark: SparkSession, path: String)(build: String => Unit): String = {
    val target = new Path(path)
    val fs = target.getFileSystem(spark.sessionState.newHadoopConf())
    val scratch = new Path(
      path + ".build-" + java.util.UUID.randomUUID().toString.take(8))
    val scratchMarker = new Path(scratch, "_SUCCESS")
    val aside = new Path(
      path + ".old-" + java.util.UUID.randomUUID().toString.take(8))
    // set when the aside directory is the only surviving copy of the old
    // index — the finally block must then NOT delete it
    var preserveAside = false
    try {
      build(scratch.toString)
      require(fs.exists(scratchMarker),
        s"index rebuild at $path produced no committed artifact " +
          "(the build closure must write a _SUCCESS-marked directory)")
      fs.delete(scratchMarker, false)
      if (fs.exists(target) && !fs.rename(target, aside))
        throw new IllegalStateException(
          s"could not move the old index at $path aside — old artifact untouched")
      if (fs.rename(scratch, target)) {
        // same posix rename-INTO guard as ensure: if something recreated
        // the target between the aside-rename and ours, our scratch moved
        // inside it — remove the stray and leave the racer's artifact be
        val stray = new Path(target, scratch.getName)
        if (fs.exists(stray)) fs.delete(stray, true)
        else fs.create(new Path(target, "_SUCCESS"), false).close()
      } else {
        // failed swap: put the old artifact back before failing, so a
        // rebuild error can never leave the path empty. The restore
        // rename's RESULT matters: if it fails (store error) — or lands
        // INSIDE a racer-recreated target as a stray child (posix
        // rename-INTO) — the aside copy is the only surviving old index,
        // and deleting it in the finally block would destroy the data
        // the "old artifact restored" guarantee promises. Preserve it
        // and name it in the error instead.
        val restoredCleanly =
          if (!fs.exists(aside)) true // nothing was moved aside (fresh path)
          else if (!fs.rename(aside, target)) false
          else !fs.exists(new Path(target, aside.getName))
        if (restoredCleanly)
          throw new IllegalStateException(
            s"could not publish the rebuilt index at $path — old artifact restored")
        preserveAside = true
        val where =
          if (fs.exists(aside)) aside.toString
          else new Path(target, aside.getName).toString
        throw new IllegalStateException(
          s"could not publish the rebuilt index at $path and the automatic " +
            s"restore failed — the old artifact is preserved at $where; " +
            "restore it manually (see IndexStore.replace's crash-recovery note)")
      }
    } finally {
      if (fs.exists(scratch)) fs.delete(scratch, true)
      if (!preserveAside && fs.exists(aside)) fs.delete(aside, true)
    }
    require(isCommitted(spark, path),
      s"index rebuild at $path did not leave a committed artifact")
    // the swap changed the path's contents OUTSIDE Spark's write path,
    // so this session's caches still describe the old artifact: cached
    // file listings AND any persisted DataFrame whose plan is rooted at
    // this path (the CacheManager would keep substituting the stale
    // rows into new reads). refreshByPath invalidates both.
    spark.catalog.refreshByPath(path)
    path
  }

  // ---- sidecar protocol -----------------------------------------------

  /** Sidecar files are the metadata half of the commit protocol: small
    * underscore-prefixed files beside the data (scan-invisible to
    * parquet), travelling WITH the directory through [[ensure]]'s and
    * [[replace]]'s atomic publish — so metadata and the rows it
    * describes can never be torn apart ([[graft.ext.AnnIndex]]'s
    * quantizer generation, [[graft.ext.CodesIndex]]'s quantization
    * stats/codebook meta, both tiers' pending-append counters). This is
    * the ONE implementation of that protocol; the read half is
    * conf-explicit so executors can probe with a shipped Hadoop conf
    * (a stream guard re-reading the generation per micro-batch). */
  def writeSidecar(spark: SparkSession, path: String,
                   name: String, value: String): Unit = {
    val f = new Path(path, name)
    val fs = f.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(f, true)
    try out.write(value.getBytes("UTF-8")) finally out.close()
  }

  def readSidecarOpt(path: String, name: String,
      conf: org.apache.hadoop.conf.Configuration): Option[String] = {
    val f = new Path(path, name)
    val fs = f.getFileSystem(conf)
    if (!fs.exists(f)) None
    else {
      val in = fs.open(f)
      try Some(new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8").trim)
      finally in.close()
    }
  }

  def readSidecarOpt(spark: SparkSession, path: String,
                     name: String): Option[String] =
    readSidecarOpt(path, name, spark.sessionState.newHadoopConf())

  /** Loud-fail read for sidecars a committed artifact MUST carry (the
    * quantizer stats without which packed codes are undecodable). */
  def readSidecar(spark: SparkSession, path: String, name: String): String =
    readSidecarOpt(spark, path, name).getOrElse(sys.error(
      s"no $name sidecar at $path — not a committed index artifact"))

  /** Canonical per-dataset index location: `<base>/graft-<kind>-<md5
    * of the dataDir FINGERPRINT>` — stable across calls while the
    * source data is unchanged (artifact reuse is the point), FRESH as
    * soon as it isn't: the fingerprint folds in every file's (relative
    * path, length, mtime) under a driver-local dataDir, so regenerating
    * testdata at the same path can never silently serve codes/labels
    * built from the old corpus (the failure would otherwise surface
    * only as an oracle hash mismatch at the next verify). The listing
    * is driver-side metadata only — no data scan, microseconds — and
    * runs per pathFor call. For a non-local dataDir (hdfs://, s3a://)
    * the fingerprint degrades to the bare path string: production
    * corpora are append-managed, not regenerated in place, and their
    * index maintenance goes through [[replace]] anyway.
    * The base is caller-supplied via `spark.graft.index.dir` (any
    * Hadoop-FS URI); driver-local java.io.tmpdir is the standalone-
    * sandbox fallback. The ONE copy of a derivation that had grown five
    * verbatim twins across the query registries — keying-scheme changes
    * happen here, nowhere else. */
  def pathFor(spark: SparkSession, kind: String, dataDir: String): String = {
    def md5(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    val sig = new StringBuilder(dataDir)
    def walk(f: java.io.File, rel: String): Unit =
      Option(f.listFiles()).map(_.sortBy(_.getName)).getOrElse(Array.empty)
        .foreach { k =>
          if (k.isDirectory) walk(k, s"$rel${k.getName}/")
          else if (!k.getName.startsWith(".")) sig.append('|')
            .append(rel).append(k.getName).append(':')
            .append(k.length).append(':').append(k.lastModified)
        }
    val root = new java.io.File(dataDir)
    if (root.isDirectory) walk(root, "")
    // two-part key: a stable DATASET digest (the dataDir path) plus the
    // content FINGERPRINT — so superseded fingerprints of the SAME
    // dataset are recognizable and garbage-collectible, while two
    // different datasets of the same kind can never collide or GC each
    // other
    val pathDigest = md5(dataDir)
    val fp = md5(sig.toString).take(12)
    val base = spark.conf.get("spark.graft.index.dir",
      sys.props("java.io.tmpdir"))
    val name = s"graft-$kind-$pathDigest-$fp"
    gcSuperseded(spark, base, kind, pathDigest, name)
    s"${base.stripSuffix("/")}/$name"
  }

  /** Best-effort GC of artifacts keyed by a SUPERSEDED fingerprint of
    * the same (kind, dataset): without it every testdata regeneration
    * orphans the full corpus-sized artifact set under the index base
    * forever. Matches exactly `graft-<kind>-<pathDigest>-<12 hex>` with
    * a different fingerprint — `.build-`/`.old-`/`.stale-` scratch
    * siblings never match the anchored pattern, so in-flight publishes
    * are untouched. A concurrent JVM still holding a pre-regeneration
    * path sees a loud-fail read instead of silently stale codes — the
    * data changed under it either way. */
  private def gcSuperseded(spark: SparkSession, base: String, kind: String,
                           pathDigest: String, current: String): Unit =
    try {
      val basePath = new Path(base)
      val fs = basePath.getFileSystem(spark.sessionState.newHadoopConf())
      val hex12 = "[0-9a-f]{12}"
      Option(fs.globStatus(
          new Path(basePath, s"graft-$kind-$pathDigest-*"))).toSeq.flatten
        .map(_.getPath)
        .filter { p =>
          val n = p.getName
          n != current && n.matches(s"graft-\\Q$kind\\E-$pathDigest-$hex12")
        }
        .foreach(p => fs.delete(p, true))
    } catch { case _: Exception => () } // GC must never fail a query
}
