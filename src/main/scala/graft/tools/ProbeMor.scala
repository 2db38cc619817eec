package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prices the COW/MOR split on a trickle of small change batches:
  * apply N batches copy-on-write vs append them merge-on-read, then
  * the read-time merge cost the deltas accumulate and the compact
  * that clears it. Usage: ProbeMor <eventsDir> [buckets] [batches]
  */
object ProbeMor {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val buckets = args.lift(1).map(_.toInt).getOrElse(64)
    val batches = args.lift(2).map(_.toInt).getOrElse(20)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    require(new java.io.File(s"$src/events.parquet").exists(),
      s"$src must be a table dir containing events.parquet")
    val ev = graft.sources.Tables(spark, src).events
      .select("user_id", "event_id", "ts_us", "event_type", "value")
    val rows = ev.count()
    val maxTs = ev.agg(max("ts_us")).head().getLong(0)
    val tmp = java.nio.file.Files.createTempDirectory("graft-pmor").toString

    def batch(i: Int) = (1 to 5).map { j =>
      (i * 10L + j, 900000000L + i, maxTs + i, "probe", 0.0, "U")
    }.toDF("user_id", "event_id", "ts_us", "event_type", "value", "op")

    def timed(f: => Unit): Double = {
      val s = System.nanoTime(); f; (System.nanoTime() - s) / 1e9
    }

    graft.ext.Upsert.init(ev, s"$tmp/cow", "user_id",
      Seq("ts_us", "event_id"), buckets)
    val tCow = timed {
      (0 until batches).foreach(i =>
        graft.ext.Upsert.applyChanges(spark, s"$tmp/cow", batch(i)))
    }

    graft.ext.Upsert.init(ev, s"$tmp/mor", "user_id",
      Seq("ts_us", "event_id"), buckets)
    val tMor = timed {
      (0 until batches).foreach(i =>
        graft.ext.Upsert.appendChanges(spark, s"$tmp/mor", batch(i)))
    }
    val tReadMerge = timed {
      graft.ext.Upsert.readTable(spark, s"$tmp/mor").count()
    }
    // snapshot mid-timeline: same merge shape over half the deltas
    val tAsOf = timed {
      graft.ext.Upsert.readTableAsOf(spark, s"$tmp/mor", batches / 2 - 1L).count()
    }
    // the incremental-consumer read: net change over the last half of
    // the timeline — delta dirs only, the base never enters the plan,
    // so this number should stay FLAT across replica decades
    val tFeed = timed {
      graft.ext.Upsert.changeFeed(spark, s"$tmp/mor",
        batches / 2 - 1L, batches - 1L).count()
    }
    val tCompact = timed {
      graft.ext.Upsert.compactDeltas(spark, s"$tmp/mor")
    }
    val tReadScan = timed {
      graft.ext.Upsert.readTable(spark, s"$tmp/mor").count()
    }
    println(f"""{"rows":$rows,"buckets":$buckets,"batches":$batches,""" +
      f""""cow_apply_s":$tCow%.1f,"mor_append_s":$tMor%.1f,""" +
      f""""mor_read_merge_s":$tReadMerge%.1f,"asof_read_s":$tAsOf%.1f,""" +
      f""""changefeed_s":$tFeed%.1f,"compact_s":$tCompact%.1f,""" +
      f""""read_after_compact_s":$tReadScan%.1f}""")
    spark.stop()
  }
}
