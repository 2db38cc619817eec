package graft.tools

import org.apache.spark.sql.SparkSession

/** Subprocess half of the cross-JVM DELTA-COMMIT race spec
  * (`UpsertCrossJvmSpec`): the merge-on-read delta commit has its own
  * publish protocol (hidden `.delta-build-*` scratch + one atomic
  * rename — see Upsert.appendChanges's scaladoc for why it left
  * IndexStore.ensure), so its race claim needs its own two-JVM
  * exercise: the same explicit delta id appended from two independent
  * writers must commit EXACTLY ONE batch (the streaming exactly-once
  * invariant), and the auto-id path must land BOTH batches under
  * distinct ids (a lost ensure race allocates a new id, never drops a
  * batch).
  *
  * args: <tablePath> <writerId> <barrierDir>
  *
  * Same barrier protocol as [[RaceEnsure]]. After the barrier this
  * JVM (1) appends 50 rows under explicit deltaId=7, (2) appends 25
  * rows under an auto-allocated id, (3) exits 0 if both appends
  * RETURNED (winner or graceful loser — a protocol failure surfaces
  * as an uncaught exception and a nonzero exit). Whole-table
  * assertions live in the parent spec, which reads the shared
  * filesystem after both writers exit. */
object RaceDelta {
  def main(args: Array[String]): Unit = {
    val Array(path, id, barrierDir) = args
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-race-delta-$id")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val ready = java.nio.file.Paths.get(barrierDir, s"ready-$id")
    val go = java.nio.file.Paths.get(barrierDir, "go")
    java.nio.file.Files.write(ready, Array.emptyByteArray)
    val deadline = System.currentTimeMillis() + 120000
    while (!java.nio.file.Files.exists(go) &&
           System.currentTimeMillis() < deadline) Thread.sleep(20)

    val contested = (1L to 50L).map(k => (k, 10L, s"c-$id", "U"))
      .toDF("k", "ts", "v", "op")
    graft.ext.Upsert.appendChanges(spark, path, contested,
      deltaId = Some(7L))
    val auto = (1L to 25L).map(i => (1000L * (if (id == "A") 1 else 2) + i,
      20L, s"auto-$id", "U")).toDF("k", "ts", "v", "op")
    graft.ext.Upsert.appendChanges(spark, path, auto)
    spark.stop()
  }
}
