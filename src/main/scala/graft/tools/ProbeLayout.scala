package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Prices the layout tier at replica scale: build round-robin, range,
  * and Z-order copies of a lineitem dir, then run the two selective
  * shapes (shipdate window; shipdate window × price band) off each
  * copy, reporting records READ (task input metrics — the row groups
  * the footer stats failed to skip) and wall time, median of 3.
  * Usage: ProbeLayout <lineitemDirOrParquet> [files]
  */
object ProbeLayout {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val files = args.lift(1).map(_.toInt).getOrElse(64)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val li = spark.read.parquet(
      if (new java.io.File(s"$src/lineitem.parquet").exists())
        s"$src/lineitem.parquet" else src)
    val tmp = java.nio.file.Files.createTempDirectory("graft-playout").toString

    val t0 = System.nanoTime()
    li.repartition(files).write.parquet(s"$tmp/robin")
    val tRobin = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    graft.ext.Layout.rangeLayout(li, Seq("l_shipdate"), s"$tmp/range", files)
    val tRange = (System.nanoTime() - t1) / 1e9
    val t2 = System.nanoTime()
    graft.ext.Layout.zorderLayout(li, "l_shipdate", "l_extendedprice",
      s"$tmp/zorder", files)
    val tZ = (System.nanoTime() - t2) / 1e9

    val read = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (t.taskMetrics != null)
            read.addAndGet(t.taskMetrics.inputMetrics.recordsRead)
      })

    def drain(): Unit = { Thread.sleep(1500) }
    def probe(df: DataFrame): (Double, Long) = {
      val times = (1 to 3).map { _ =>
        val s = System.nanoTime()
        df.agg(count(lit(1))).head()
        (System.nanoTime() - s) / 1e9
      }.sorted
      drain(); val before = read.get()
      df.agg(count(lit(1))).head()
      drain()
      (times(1), read.get() - before)
    }

    def window(df: DataFrame) = df.filter(
      col("l_shipdate") >= lit("1997-03-01") &&
      col("l_shipdate") < lit("1997-06-01"))
    def band(df: DataFrame) = df.filter(
      col("l_shipdate") >= lit("1997-01-01") &&
      col("l_shipdate") < lit("1997-07-01") &&
      col("l_extendedprice").between(20000, 30000))

    val total = li.count()
    val out = for (
      (name, path) <- Seq("robin" -> s"$tmp/robin", "range" -> s"$tmp/range",
                          "zorder" -> s"$tmp/zorder");
      (qn, q) <- Seq[(String, DataFrame => DataFrame)](
                     "window" -> window, "band" -> band)
    ) yield {
      val (sec, rec) = probe(q(spark.read.parquet(path)))
      f""""${name}_$qn":{"s":$sec%.2f,"read":$rec}"""
    }
    println(s"""{"rows":$total,"files":$files,""" +
      f""""build_s":{"robin":$tRobin%.1f,"range":$tRange%.1f,"zorder":$tZ%.1f},""" +
      out.mkString(",") + "}")
    spark.stop()
  }
}
