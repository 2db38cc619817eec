package graft.tools

import org.apache.spark.sql.SparkSession

/** Subprocess half of the cross-JVM [[graft.core.IndexStore]] race
  * spec (`IndexStoreCrossJvmSpec`): a SEPARATE JVM with its own
  * SparkSession calling `ensure` on a shared path — the in-process
  * concurrency specs can't exercise the protocol's real claim, which
  * is about two independent writers on one filesystem, not two
  * threads over one session.
  *
  * args: <indexPath> <builderId> <buildDelayMs> <barrierDir>
  *
  * Protocol: writes `<barrierDir>/ready-<id>` then spin-waits for
  * `<barrierDir>/go` (the spec touches it once BOTH processes are
  * ready), so the two `ensure` calls genuinely overlap regardless of
  * JVM startup skew. The build sleeps `buildDelayMs` before writing,
  * keeping both builds in flight together. Exit codes: 0 = ensure
  * returned and the committed index is readable from this JVM
  * (winner or graceful loser — the spec asserts BOTH exit 0);
  * 3 = readback mismatch; any exception = nonzero via the default
  * uncaught-exit path. */
object RaceEnsure {
  def main(args: Array[String]): Unit = {
    val Array(path, id, delayMs, barrierDir) = args
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-race-$id")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val ready = java.nio.file.Paths.get(barrierDir, s"ready-$id")
    val go = java.nio.file.Paths.get(barrierDir, "go")
    java.nio.file.Files.write(ready, Array.emptyByteArray)
    val barrierDeadline = System.currentTimeMillis() + 120000
    while (!java.nio.file.Files.exists(go) &&
           System.currentTimeMillis() < barrierDeadline) Thread.sleep(20)

    graft.core.IndexStore.ensure(spark, path) { scratch =>
      Thread.sleep(delayMs.toLong)
      spark.range(100)
        .selectExpr("id", s"'$id' AS builder")
        .write.mode("overwrite").parquet(scratch)
    }
    val rows = spark.read.parquet(path).count()
    spark.stop()
    if (rows != 100) sys.exit(3)
  }
}
