package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prices the upsert table's selectivity claim at replica scale:
  * seed a table from an events dir, then apply a change batch
  * touching a FRACTION of the keys and compare against the
  * full-rewrite alternative (re-init over the merged rows — what a
  * user without selective merge has to do). Reports touched bucket
  * count, apply seconds, and the full-rewrite seconds.
  * Usage: ProbeUpsert <eventsDir> [buckets] [changeKeys]
  */
object ProbeUpsert {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val buckets = args.lift(1).map(_.toInt).getOrElse(64)
    val changeKeys = args.lift(2).map(_.toInt).getOrElse(50)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    require(new java.io.File(s"$src/events.parquet").exists(),
      s"$src must be a table dir containing events.parquet")
    val ev = graft.sources.Tables(spark, src).events
      .select("user_id", "event_id", "ts_us", "event_type", "value")
    val rows = ev.count()
    val tmp = java.nio.file.Files.createTempDirectory("graft-pupsert").toString

    val t0 = System.nanoTime()
    graft.ext.Upsert.init(ev, s"$tmp/t", "user_id",
      Seq("ts_us", "event_id"), buckets)
    val tInit = (System.nanoTime() - t0) / 1e9

    // a change batch over `changeKeys` distinct users: bump their
    // latest value past everything (ts_us beyond the corpus max)
    val maxTs = ev.agg(max("ts_us")).head().getLong(0)
    val changes = ev.filter(col("user_id") <= changeKeys)
      .groupBy("user_id").agg(max("event_id").as("event_id"))
      .withColumn("ts_us", lit(maxTs + 1))
      .withColumn("event_type", lit("probe"))
      .withColumn("value", lit(0.0))
      .withColumn("op", lit("U"))
      .select("user_id", "event_id", "ts_us", "event_type", "value", "op")
      .persist()
    val nChanges = changes.count()

    val t1 = System.nanoTime()
    graft.ext.Upsert.applyChanges(spark, s"$tmp/t", changes)
    val tApply = (System.nanoTime() - t1) / 1e9
    val touched = changes
      .select(pmod(xxhash64(col("user_id")), lit(buckets))).distinct().count()

    // the no-selective-merge alternative: full latest-per-key rebuild
    // over table ∪ changes
    val merged = graft.ext.Upsert.readTable(spark, s"$tmp/t")
    val t2 = System.nanoTime()
    graft.ext.Upsert.init(merged, s"$tmp/full", "user_id",
      Seq("ts_us", "event_id"), buckets)
    val tFull = (System.nanoTime() - t2) / 1e9

    println(f"""{"rows":$rows,"buckets":$buckets,"changes":$nChanges,""" +
      f""""touched":$touched,"init_s":$tInit%.1f,"apply_s":$tApply%.1f,""" +
      f""""full_rewrite_s":$tFull%.1f}""")
    spark.stop()
  }
}
