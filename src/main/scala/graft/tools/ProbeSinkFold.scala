package graft.tools

import org.apache.spark.sql.SparkSession

/** Prices StreamSink's listing bottleneck and the fold that fixes it:
  * append N tiny batches (the 1 s-trigger layout), time a full
  * readCommitted count, fold all but the newest, time again. The data
  * is identical before and after — the delta is pure dir-listing +
  * marker-probe + per-file-open cost, the thing that grows without
  * bound under a trigger but stays flat behind a fold cadence.
  * Usage: ProbeSinkFold [nBatches] */
object ProbeSinkFold {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft-sinkfold").toString
    (0L until n).foreach { i =>
      graft.streaming.StreamSink.appendBatch(
        spark, root, "probe", i, Seq((i, i * 10)).toDF("k", "v")
          .coalesce(1))
    }
    def timeRead(): (Double, Long) = {
      val t0 = System.nanoTime()
      val c = graft.streaming.StreamSink.readCommitted(spark, root).count()
      ((System.nanoTime() - t0) / 1e9, c)
    }
    val (tBefore, cBefore) = timeRead()
    val t1 = System.nanoTime()
    graft.streaming.StreamSink.fold(spark, root, n - 2L)
    val foldSec = (System.nanoTime() - t1) / 1e9
    val (tAfter, cAfter) = timeRead()
    require(cBefore == cAfter, s"fold changed the row count: $cBefore -> $cAfter")
    println(f"""{"batches":$n,"rows":$cBefore,"read_before_s":$tBefore%.2f,""" +
      f""""fold_s":$foldSec%.2f,"read_after_s":$tAfter%.2f}""")
    spark.stop()
  }
}
