package graft

import java.io.File
import java.util.concurrent.TimeUnit

import org.apache.spark.sql.functions._

/** The delta commit's race claims exercised across REAL process
  * boundaries (the IndexStoreCrossJvmSpec precedent, applied to the
  * upsert table's own publish protocol — hidden scratch + one atomic
  * rename, not IndexStore.ensure): two independent JVMs append the
  * SAME explicit delta id and then one auto-id batch each.
  *  - explicit id: exactly ONE batch commits under delta=7, whole and
  *    single-writer (the streaming exactly-once invariant), the loser
  *    exits clean;
  *  - auto ids: BOTH batches land, under distinct ids — a lost race
  *    allocates a new id, never silently drops a batch;
  *  - no `.delta-build-*` scratch residue inside the table. */
class UpsertCrossJvmSpec extends SparkTestBase {
  import spark.implicits._

  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar"
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  test("two JVMs racing the delta commit: one wins id 7, auto ids never drop a batch") {
    val base = java.nio.file.Files.createTempDirectory("graft-xjvm-delta").toString
    val path = s"$base/t"
    graft.ext.Upsert.init(Seq((0L, 0L, "seed")).toDF("k", "ts", "v"),
      path, "k", Seq("ts"), 4)
    val barrier = s"$base/barrier"
    new File(barrier).mkdirs()

    def launch(id: String): Process = {
      val java = sys.props("java.home") + "/bin/java"
      val cmd = Seq(java) ++ addOpens ++ Seq(
        "-Xmx2g", "-Dspark.ui.enabled=false",
        "-cp", sys.props("java.class.path"),
        "graft.tools.RaceDelta", path, id, barrier)
      new ProcessBuilder(cmd: _*)
        .redirectErrorStream(true)
        .redirectOutput(new File(s"$base/$id.log"))
        .start()
    }

    val pa = launch("A")
    val pb = launch("B")
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

    // the contested id holds exactly ONE writer's whole batch
    val d7 = spark.read.parquet(s"$path/delta=7")
    assert(d7.count() === 50)
    val writers = d7.select("v").distinct().as[String].collect()
    assert(writers.length === 1,
      s"torn delta: rows from ${writers.mkString(", ")}")

    // both auto batches landed, under distinct non-contested ids
    val ids = graft.ext.Upsert.deltas(spark, path)
    assert(ids.contains(7L) && ids.length === 3,
      s"expected delta 7 plus one auto id per writer, got $ids")
    val autoRows = graft.ext.Upsert.readTable(spark, path)
      .filter(col("v").startsWith("auto-"))
    assert(autoRows.count() === 50,
      "a lost allocation race must re-allocate, never drop the batch")
    assert(autoRows.select("v").distinct().count() === 2)

    // no hidden scratch residue inside the table root
    val residue = new File(path).listFiles().map(_.getName)
      .filter(n => n.startsWith(".delta-build-"))
    assert(residue.isEmpty, s"delta commit left residue: ${residue.mkString(", ")}")
  }
}
