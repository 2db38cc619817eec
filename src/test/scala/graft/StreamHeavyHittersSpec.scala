package graft

import graft.streaming.StreamHeavyHitters
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The streaming frequent-items monitor: per-window top-k merged
  * across micro-batches is EXACT while distinct items fit maxTracked
  * (golden-comparable — the quantile twin can only pin a rank bound,
  * but ItemsSketch under capacity is exact counts), windows emit at
  * the watermark, and the late/too-late edges hold. */
class StreamHeavyHittersSpec extends SparkTestBase {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val Sec = 1000000L

  private def drive(batches: Seq[Seq[(Long, String)]], k: Int = 3)
      : Map[Long, Map[String, Long]] = {
    val in = MemoryStream[(Long, String)]
    val q = StreamHeavyHitters.windowed(
        in.toDF().toDF("ts_us", "item"), k = k)
      .writeStream.format("memory").queryName("hh_out")
      .outputMode("append").start()
    try {
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
    } finally q.stop()
    val rows = spark.table("hh_out")
      .as[(Long, Int, String, Long)].collect()
    spark.sql("DROP TABLE IF EXISTS hh_out")
    rows.groupBy(_._1).map { case (w, rs) =>
      w -> rs.map(r => r._3 -> r._4).toMap }
  }

  test("cross-batch windows produce exact golden top-k under capacity") {
    // window [0,10s): a x5, b x3, c x1 split across two batches;
    // window [10,20s): d x2, e x1. Distinct counts — no boundary ties.
    val w0a = Seq.fill(3)((1 * Sec, "a")) ++ Seq.fill(2)((2 * Sec, "b"))
    val w0b = Seq.fill(2)((3 * Sec, "a")) ++ Seq((4 * Sec, "b"), (5 * Sec, "c"))
    val w1 = Seq.fill(2)((11 * Sec, "d")) :+ ((12 * Sec, "e"))
    val got = drive(Seq(w0a, w0b ++ w1, Seq((60 * Sec, "zz"))))
    assert(got(0L) === Map("a" -> 5L, "b" -> 3L, "c" -> 1L))
    assert(got(10 * Sec) === Map("d" -> 2L, "e" -> 1L))
  }

  test("k truncates to the heaviest items; late folds in; too-late drops") {
    val got = drive(Seq(
      Seq.fill(4)((21 * Sec, "hot")) ++ Seq((22 * Sec, "warm"), (23 * Sec, "cold"),
        (24 * Sec, "warm")),
      Seq((33 * Sec, "next")),     // watermark -> 28s, [20,30) still open
      Seq((29 * Sec, "hot")),      // late but above watermark: folds in
      Seq((60 * Sec, "zz")),       // closes everything
      Seq((22 * Sec, "ghost"))),   // too late: dropped
      k = 2)
    assert(got(20 * Sec) === Map("hot" -> 5L, "warm" -> 2L),
      s"top-2 with the late event folded: ${got(20 * Sec)}")
    assert(!got.values.exists(_.contains("ghost")))
  }
}
