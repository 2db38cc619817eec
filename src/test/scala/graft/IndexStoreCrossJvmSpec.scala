package graft

import java.io.File
import java.util.concurrent.TimeUnit

/** The commit protocol's REAL claim exercised for real: two
  * independent JVMs (separate SparkSessions, separate processes —
  * nothing shared but the filesystem) race `IndexStore.ensure` on one
  * path. One build wins the publish; the loser must lose GRACEFULLY
  * (exit clean, read the winner's artifact); the committed index must
  * be untorn (exactly one builder's rows, the full row count) and the
  * location free of scratch/stale leftovers. The r9 `StreamAnnSpec`
  * simulated an external maintainer by hand-writing a sidecar; this
  * closes the gap for the commit protocol itself. A file barrier
  * inside `graft.tools.RaceEnsure` guarantees the two `ensure` calls
  * overlap regardless of JVM startup skew. */
class IndexStoreCrossJvmSpec extends SparkTestBase {
  import spark.implicits._

  // mirror of build.sbt's jdk17AddOpens — a bare `java` launch of a
  // SparkSession needs the module opens spark-submit would inject
  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar"
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  test("two JVMs racing ensure: one publish wins, the loser exits clean, no torn artifact") {
    val base = java.nio.file.Files.createTempDirectory("graft-xjvm").toString
    val path = s"$base/idx"
    val barrier = s"$base/barrier"
    new File(barrier).mkdirs()

    def launch(id: String): Process = {
      val java = sys.props("java.home") + "/bin/java"
      val cmd = Seq(java) ++ addOpens ++ Seq(
        "-Xmx2g", "-Dspark.ui.enabled=false",
        "-cp", sys.props("java.class.path"),
        "graft.tools.RaceEnsure", path, id, "2000", barrier)
      new ProcessBuilder(cmd: _*)
        .redirectErrorStream(true)
        .redirectOutput(new File(s"$base/$id.log"))
        .start()
    }

    val pa = launch("A")
    val pb = launch("B")
    // release the barrier only once BOTH subprocesses report ready —
    // this is what makes the two ensure calls actually concurrent
    val readyDeadline = System.currentTimeMillis() + 120000
    def ready(id: String) = new File(barrier, s"ready-$id").exists()
    while (!(ready("A") && ready("B")) &&
           System.currentTimeMillis() < readyDeadline) Thread.sleep(50)
    assert(ready("A") && ready("B"), "subprocesses never reached the barrier")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(barrier, "go"), Array.emptyByteArray)

    assert(pa.waitFor(180, TimeUnit.SECONDS), "A timed out")
    assert(pb.waitFor(180, TimeUnit.SECONDS), "B timed out")
    def log(id: String) = scala.util.Try(new String(
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$base/$id.log")), "UTF-8").takeRight(2000))
      .getOrElse("<no log>")
    assert(pa.exitValue() === 0, s"A failed:\n${log("A")}")
    assert(pb.exitValue() === 0, s"B failed:\n${log("B")}")

    // committed, whole, and from exactly ONE builder — a torn artifact
    // would show 200 rows or two builder ids
    assert(graft.core.IndexStore.isCommitted(spark, path))
    val frame = spark.read.parquet(path)
    assert(frame.count() === 100L)
    val builders = frame.select("builder").distinct().as[String].collect()
    assert(builders.length === 1,
      s"torn artifact: rows from builders ${builders.mkString(", ")}")

    // no scratch/stale/aside residue next to the index
    val residue = new File(base).listFiles().map(_.getName)
      .filter(n => n.contains(".build-") || n.contains(".stale-") ||
                   n.contains(".old-"))
    assert(residue.isEmpty, s"protocol left residue: ${residue.mkString(", ")}")
  }
}
