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

  test("a snapshot reader racing compactDeltas + vacuum completes exactly or fails loud, never partial") {
    val base = java.nio.file.Files.createTempDirectory("graft-xjvm-snap").toString
    val path = s"$base/t"
    // base + two committed deltas: the asOf-0 snapshot reads base+delta0;
    // enough rows that the reader's 5 ms/row brake holds the scan open
    // (~1.5 s on 2 cores) across the maintainer's 500 ms-delayed swap
    graft.ext.Upsert.init(
      (1L to 300L).map(k => (k, 0L, "base")).toDF("k", "ts", "v"),
      path, "k", Seq("ts"), 4)
    graft.ext.Upsert.appendChanges(spark, path,
      (1L to 150L).map(k => (k, 1L, "d0", "U")).toDF("k", "ts", "v", "op"),
      deltaId = Some(0L))
    graft.ext.Upsert.appendChanges(spark, path,
      (1L to 150L).map(k => (k, 2L, "d1", "U")).toDF("k", "ts", "v", "op"),
      deltaId = Some(1L))
    // truth, computed BEFORE any maintenance: the exact snapshot the
    // reader must serve whole if it serves anything
    val truth = graft.ext.Upsert.readTableAsOf(spark, path, 0L)
      .agg(count(lit(1)), sum(col("ts"))).head()
    val (tRows, tSum) = (truth.getLong(0), truth.getLong(1))

    val barrier = s"$base/barrier"
    new File(barrier).mkdirs()
    def launch(role: String): Process = {
      val java = sys.props("java.home") + "/bin/java"
      val cmd = Seq(java) ++ addOpens ++ Seq(
        "-Xmx2g", "-Dspark.ui.enabled=false",
        "-cp", sys.props("java.class.path"),
        "graft.tools.RaceSnapshotRead", path, role, barrier)
      new ProcessBuilder(cmd: _*)
        .redirectErrorStream(true)
        .redirectOutput(new File(s"$base/$role.log"))
        .start()
    }
    val pr = launch("reader")
    val pm = launch("maintainer")
    val readyDeadline = System.currentTimeMillis() + 120000
    def ready(r: String) = new File(barrier, s"ready-$r").exists()
    while (!(ready("reader") && ready("maintainer")) &&
           System.currentTimeMillis() < readyDeadline) Thread.sleep(50)
    assert(ready("reader") && ready("maintainer"),
      "subprocesses never reached the barrier")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(barrier, "go"), Array.emptyByteArray)

    assert(pr.waitFor(180, TimeUnit.SECONDS), "reader timed out")
    assert(pm.waitFor(180, TimeUnit.SECONDS), "maintainer timed out")
    def log(r: String) = scala.util.Try(new String(
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$base/$r.log")), "UTF-8").takeRight(2000))
      .getOrElse("<no log>")
    assert(pm.exitValue() === 0, s"maintainer failed:\n${log("maintainer")}")
    val result = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(barrier, "result")), "UTF-8")
    pr.exitValue() match {
      case 0 =>
        // served whole: must be EXACTLY the pre-maintenance snapshot
        assert(result === s"rows=$tRows sum=$tSum",
          s"reader exited 0 with a PARTIAL/TORN snapshot: got '$result', " +
            s"expected rows=$tRows sum=$tSum — the complete-or-loud " +
            "contract is broken")
      case 2 =>
        // the loud outcome: listed files vanished under the scan
        assert(result.startsWith("failed="),
          s"reader exited 2 without recording its failure: '$result'")
      case other =>
        fail(s"reader exited $other (protocol bug, not a race outcome):\n" +
          log("reader"))
    }
    // either way the maintained table itself is whole and consistent:
    // compaction folded both deltas (k 1..150 at ts=2 via d1, the rest
    // base) and a fresh reader sees it
    val folded = graft.ext.Upsert.readTable(spark, path)
    assert(folded.count() === 300)
    assert(folded.filter(col("ts") === 2L).count() === 150,
      "fold must serve every d1 winner")
    assert(graft.ext.Upsert.deltas(spark, path).isEmpty,
      "compaction must have consumed the delta dirs")
  }
}
