package graft.core

/** Registry for driver-local scratch ARTIFACTS held on behalf of
  * lazily-returned query results — the filesystem sibling of
  * [[CacheScope]].
  *
  * A registered query that stages a throwaway on-disk artifact (the
  * streaming-maintainer bench mirrors seed a fresh labels copy per
  * invocation so every rep measures the same work) cannot delete it
  * before returning: the returned DataFrame is lazy and reads the
  * files only at the caller's terminal action. Left alone, each
  * invocation leaks one directory into java.io.tmpdir (r15 advisor:
  * ~3 per bench run, 1 per verify). Queries register such paths here;
  * a JVM shutdown hook removes them after the harness's last action —
  * Verify and Bench are both single-JVM mains, so "JVM exit" is
  * exactly "after every registered result was consumed".
  *
  * Deliberately NOT for committed artifacts under [[IndexStore]]'s
  * reuse contract (fixtures, persisted indexes) — only for
  * per-invocation scratch whose lifetime is one query result. */
object ScratchDirs {
  private val registered =
    new java.util.concurrent.ConcurrentLinkedQueue[String]()
  @volatile private var hooked = false

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(); ()
  }

  /** Register a driver-local path for deletion at JVM exit; returns it. */
  def register(path: String): String = {
    if (!hooked) synchronized {
      if (!hooked) {
        Runtime.getRuntime.addShutdownHook(new Thread(() => purgeNow()))
        hooked = true
      }
    }
    registered.add(path)
    path
  }

  /** Delete every registered path now (spec hook; safe to call twice —
    * the queue drains and a vanished path is a no-op). */
  def purgeNow(): Unit = {
    var p = registered.poll()
    while (p != null) {
      try deleteRecursively(new java.io.File(p))
      catch { case _: Throwable => () } // cleanup must never fail a run
      p = registered.poll()
    }
  }
}
