package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Subprocess halves of the snapshot-reader-vs-maintenance race spec
  * (`UpsertCrossJvmSpec`): one JVM holds a [[graft.ext.Upsert
  * .readTableAsOf]] scan open while another runs `compactDeltas` (which
  * DESTROYS the delta dirs the snapshot reads and swaps every base
  * bucket) followed by `vacuum(grace=0)`. The contract under test is
  * the class doc's complete-or-loud guarantee: the reader either
  * finishes with the EXACT pre-maintenance snapshot (its file list was
  * served whole before the swap) or fails loud (listed files vanish —
  * FileNotFound through Spark's default ignoreMissingFiles=false) —
  * never a silent partial/torn result, which is the one outcome the
  * commit protocol exists to make impossible (old and new generations
  * never share file names, so a stale list can't silently blend them).
  *
  * args: <tablePath> <role: reader|maintainer> <barrierDir>
  *
  * reader: barrier-ready, waits for go, then consumes the asOf-0
  * snapshot through a ~5 ms/row brake (holds the scan open across the
  * maintenance window), writes `rows=<n> sum=<s>` to barrier/result on
  * success and exits 0; on ANY read failure writes `failed=<msg>` and
  * exits 2 (the loud outcome — distinguished from protocol bugs, which
  * surface as other exit codes).
  *
  * maintainer: waits for the reader's `reading` marker (written right
  * before the reader's action starts), sleeps 500 ms so the brake is
  * mid-scan, compacts, vacuums with zero grace, exits 0. */
object RaceSnapshotRead {
  def main(args: Array[String]): Unit = {
    val Array(path, role, barrierDir) = args
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-race-snap-$role")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.files.ignoreMissingFiles", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def touch(name: String): Unit = java.nio.file.Files.write(
      java.nio.file.Paths.get(barrierDir, name), Array.emptyByteArray)
    def await(name: String): Unit = {
      val deadline = System.currentTimeMillis() + 120000
      while (!java.nio.file.Files.exists(
               java.nio.file.Paths.get(barrierDir, name)) &&
             System.currentTimeMillis() < deadline) Thread.sleep(20)
    }

    role match {
      case "reader" =>
        touch("ready-reader"); await("go")
        val brake = udf((k: Long) => { Thread.sleep(5); true })
        val snap = graft.ext.Upsert.readTableAsOf(spark, path, 0L)
          .filter(brake(col("k")))
        try {
          touch("reading")
          val r = snap.agg(count(lit(1)), sum(col("ts"))).head()
          java.nio.file.Files.write(
            java.nio.file.Paths.get(barrierDir, "result"),
            s"rows=${r.getLong(0)} sum=${r.getLong(1)}".getBytes("UTF-8"))
        } catch {
          case e: Throwable =>
            java.nio.file.Files.write(
              java.nio.file.Paths.get(barrierDir, "result"),
              s"failed=${e.getClass.getName}".getBytes("UTF-8"))
            spark.stop(); sys.exit(2)
        }
      case "maintainer" =>
        touch("ready-maintainer"); await("go"); await("reading")
        Thread.sleep(500) // land inside the reader's braked scan
        graft.ext.Upsert.compactDeltas(spark, path)
        graft.ext.Upsert.vacuum(spark, path, graceMs = 0L)
        touch("maintained")
      case other => sys.error(s"unknown role $other")
    }
    spark.stop()
  }
}
