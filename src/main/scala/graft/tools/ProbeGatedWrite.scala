package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measure the quality gate's WRITE path claim (r11 ask #7): the
  * x_dq_* read side is decade-laddered, but `Quality.writeGated` — the
  * one-pass clean/quarantine split — had specs and no scale row. This
  * probe times, per corpus size, 3-rep medians of:
  *
  *   gated        Quality.writeGated — ONE corpus read, one partitioned
  *                write landing both splits under dq=clean|quarantine
  *   filter2      the alternative a naive pipeline runs: two separate
  *                jobs, each re-reading the corpus (write clean =
  *                filter(pass), then write quarantine = filter(!pass))
  *
  * The claim under test: filter-twice pays ~2× the scan, so gated
  * approaches half its cost as the corpus outgrows fixed overheads.
  *
  * Usage: runMain graft.tools.ProbeGatedWrite <docsDir>... */
object ProbeGatedWrite {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/graft-sf1", "/tmp/graft-sf10")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val checks = graft.queries.QualityQueries.docChecks
    dirs.foreach { dir =>
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val n = docs.count()
      val root = java.nio.file.Files
        .createTempDirectory("graft-gated-probe").toString
      def med(body: Int => Unit): Double =
        (1 to 3).map { i =>
          val t0 = System.nanoTime(); body(i); (System.nanoTime() - t0) / 1e9
        }.sorted.apply(1)
      val pass = graft.ext.Quality.passExpr(checks)
      val tGated = med { i =>
        graft.ext.Quality.writeGated(docs, checks, s"$root/gated$i") }
      val tFilter2 = med { i =>
        docs.filter(pass).write.mode("overwrite")
          .parquet(s"$root/f2clean$i")
        docs.filter(!coalesce(pass, lit(false))).write.mode("overwrite")
          .parquet(s"$root/f2quar$i")
      }
      // row-set equality of the two strategies, checked once per dir
      val g = spark.read.parquet(s"$root/gated1")
      val cnt = (g.filter(col("dq") === "clean").count(),
        g.filter(col("dq") === "quarantine").count())
      val cnt2 = (spark.read.parquet(s"$root/f2clean1").count(),
        spark.read.parquet(s"$root/f2quar1").count())
      require(cnt == cnt2, s"split mismatch: gated $cnt vs filter2 $cnt2")
      println(f"""{"probe":"gated_write","dir":"$dir","docs":$n,"gated_s":$tGated%.3f,"filter2_s":$tFilter2%.3f,"ratio":${tFilter2 / tGated}%.2f}""")
    }
    spark.stop()
  }
}
