package graft

import graft.streaming.StreamQuantiles
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The streaming quantile monitor's contract: per-window GK summaries
  * merged across micro-batches satisfy the rank-error bound against
  * the window's exact distribution (golden row-equality would pin
  * merge topology — see the StreamQuantiles scaladoc), windows emit
  * once the watermark passes their end, late-within-delay events fold
  * into the summary, and too-late events drop. */
class StreamQuantilesSpec extends SparkTestBase {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val Sec = 1000000L
  private val eps = 1e-3 // accuracy = 1000 default

  private def drive(batches: Seq[Seq[(Long, Double)]])
      : Map[Long, (Seq[Double], Long)] = {
    val in = MemoryStream[(Long, Double)]
    val q = StreamQuantiles.windowed(in.toDF().toDF("ts_us", "value"))
      .writeStream.format("memory").queryName("quant_out")
      .outputMode("append").start()
    try {
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
    } finally q.stop()
    val rows = spark.table("quant_out")
      .as[(Long, Double, Double, Double, Long)].collect()
    spark.sql("DROP TABLE IF EXISTS quant_out")
    rows.map(r => r._1 -> ((Seq(r._2, r._3, r._4), r._5))).toMap
  }

  test("cross-batch windows satisfy the GK rank-error contract on close") {
    // window [0,10s): 1..60 in batch 1, 61..100 in batch 2 (one summary
    // merged across micro-batches); window [10,20s): 500 values.
    // Sentinel at 60s pushes the watermark past both ends.
    val w0 = (1 to 100).map(i => (i % 10 * Sec, i.toDouble))
    val w1 = (1 to 500).map(i => (10 * Sec + i % 10 * Sec, i * 3.5))
    val got = drive(Seq(w0.take(60), w0.drop(60) ++ w1,
      Seq((60 * Sec, 0.0))))
    assert(got.keySet === Set(0L, 10 * Sec))
    for ((winStart, exact) <- Seq(
        0L -> (1 to 100).map(_.toDouble),
        10 * Sec -> (1 to 500).map(_ * 3.5))) {
      val (qs, n) = got(winStart)
      assert(n === exact.length.toLong)
      val sorted = exact.sorted
      for ((v, q) <- qs.zip(Seq(0.25, 0.5, 0.75))) {
        val rank = sorted.count(_ <= v).toDouble
        val err = math.abs(rank / n - q)
        assert(err <= eps + 1.0 / n,
          s"window $winStart q=$q: value $v rank $rank of $n, err $err")
      }
    }
  }

  test("late-within-delay folds into the open window; too-late drops") {
    // window [20,30s): 21s event, then max advances to 33s (watermark
    // 28s — window still open), then a LATE 29s event (behind max,
    // above watermark) must fold in. Sentinel closes everything; a
    // then-too-late 22s event must not resurrect or duplicate the
    // emitted window.
    val got = drive(Seq(
      Seq((21 * Sec, 10.0)),
      Seq((33 * Sec, 99.0)),
      Seq((29 * Sec, 20.0)), // late but >= watermark: accepted
      Seq((60 * Sec, 0.0)),  // closes [20,30) and [30,40)
      Seq((22 * Sec, 77.0)))) // too late: dropped silently
    val (qs, n) = got(20 * Sec)
    assert(n === 2L, s"late-within-delay event lost: $got")
    assert(qs.head === 10.0 && qs.last === 20.0)
    // the too-late 77.0 is nowhere: counts and quartiles unchanged
    assert(!got.values.exists { case (q, _) => q.contains(77.0) })
  }
}
