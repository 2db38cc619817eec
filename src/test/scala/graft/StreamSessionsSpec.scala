package graft

import graft.streaming.StreamSessions
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming session windows: watermark-driven close, cross-batch
  * merge, the exact-gap tie rule, and — the load-bearing contract —
  * golden equality to the batch gaps-and-islands form on replayed
  * input (the StreamFunnel differential precedent). */
class StreamSessionsSpec extends SparkTestBase {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val MinUs = 60L * 1000000

  /** The batch query's gaps-and-islands sessionization over the same
    * (user_id, ts_us) rows — lifted verbatim from
    * EventQueries.sessionWindows, minus the table read. */
  private def batchSessions(rows: Seq[(Long, Long)]) = {
    val gapUs = 30L * MinUs
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
    val run = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rows.toDF("user_id", "ts_us")
      .select(col("user_id"), col("ts_us"),
        when(col("ts_us") - lag(col("ts_us"), 1).over(byUser) > gapUs ||
             lag(col("ts_us"), 1).over(byUser).isNull, 1L).otherwise(0L)
          .as("new_sess"))
      .withColumn("session_id", sum(col("new_sess")).over(run))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts_us")).as("s"), max(col("ts_us")).as("e"),
           count(lit(1)).as("n"))
      .select(col("user_id"), col("s"), col("e"), col("n"))
      .as[(Long, Long, Long, Long)].collect().toSet
  }

  private def drive(batches: Seq[Seq[(Long, Long, Long)]])
      : Set[(Long, Long, Long, Long)] = {
    val in = MemoryStream[(Long, Long, Long)]
    val q = StreamSessions.sessions(
        in.toDF().toDF("user_id", "event_id", "ts_us"))
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
    } finally q.stop()
    spark.table("sess_out")
      .as[(Long, Long, Long, Long)].collect().toSet
  }

  test("golden: sessions close at the watermark and equal the batch form") {
    // u1: two sessions (events 0/10/20 min, then 90/95 min);
    // u2: one long session that spans micro-batches (35-min chain of
    // 20-min gaps — merges across batch boundaries).
    // A final far-future sentinel (u9) pushes the watermark past every
    // real session so append mode emits them all.
    val batch1 = Seq(
      (1L, 1L, 0 * MinUs), (1L, 2L, 10 * MinUs), (1L, 3L, 20 * MinUs),
      (2L, 4L, 0 * MinUs))
    val batch2 = Seq(
      (1L, 5L, 90 * MinUs), (1L, 6L, 95 * MinUs),
      (2L, 7L, 20 * MinUs), (2L, 8L, 40 * MinUs))
    val sentinel = Seq((9L, 99L, 10000 * MinUs))
    val got = drive(Seq(batch1, batch2, sentinel))
      .filter(_._1 != 9L)
    val want = batchSessions(
      (batch1 ++ batch2).map(e => (e._1, e._3)))
    assert(got === want)
    // and the shape is right: u1 has two sessions, u2's one session
    // merged across micro-batches
    assert(got.count(_._1 == 1L) === 2)
    assert(got.filter(_._1 == 2L) === Set((2L, 0L, 40 * MinUs, 3L)))
  }

  test("a gap of exactly the timeout stays ONE session (the batch > rule)") {
    // 0 and +30min exactly: gaps-and-islands keeps them together
    // (new session only when gap > timeout); session_window agrees
    // because boundary-touching windows merge (end inclusive)
    val events = Seq((5L, 1L, 0L), (5L, 2L, 30 * MinUs))
    val sentinel = Seq((9L, 99L, 10000 * MinUs))
    val got = drive(Seq(events, sentinel)).filter(_._1 != 9L)
    assert(got === Set((5L, 0L, 30 * MinUs, 2L)))
    assert(got === batchSessions(events.map(e => (e._1, e._3))))
    // one microsecond MORE than the timeout splits
    val events2 = Seq((6L, 1L, 0L), (6L, 2L, 30 * MinUs + 1))
    val got2 = drive(Seq(events2, sentinel)).filter(_._1 != 9L)
    assert(got2 === Set((6L, 0L, 0L, 1L), (6L, 30 * MinUs + 1, 30 * MinUs + 1, 1L)))
    assert(got2 === batchSessions(events2.map(e => (e._1, e._3))))
  }

  test("replaying the real events table reproduces the batch a5 sessions") {
    val t = graft.sources.Tables(spark, sf()).events
      .select(col("user_id"), col("event_id"), col("ts_us"))
      .as[(Long, Long, Long)].collect().toSeq
    val maxTs = t.map(_._3).max
    val got = drive(Seq(t, Seq((-1L, -1L, maxTs + 10000 * MinUs))))
      .filter(_._1 != -1L)
    val want = graft.queries.EventQueries.sessionWindows(spark, sf())
      .select(col("user_id"), col("sess_start_us"), col("sess_end_us"),
        col("n_events"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === want)
  }
}
