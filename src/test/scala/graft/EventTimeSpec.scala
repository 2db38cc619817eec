package graft

import graft.streaming._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Event-time semantics (FIXTURES.md A2): tumbling windows finalize under
  * the watermark; too-late records are split to the side output.
  * Protocol: "timestamp,word" lines, 10 s windows, 5 s disorder,
  * 5 s allowed lateness (EventTimeWordCountDebug.java).
  */
class EventTimeSpec extends SparkTestBase {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("w5 late-data audit is chunk-size-invariant") {
    // the chunked prefix-max must reproduce the exact global prefix-max
    // at ANY chunk size — compare the sf-test size (2^10), the production
    // default (2^20, one chunk at this SF), and a ragged odd size
    def run(cs: Long) = graft.queries.EventQueries.lateDataAudit(spark, sf(), cs)
      .select(col("event_id"), col("ts_us"), col("watermark_us"), col("status"))
      .as[(Long, Long, Option[Long], String)].collect().sortBy(_._1).toSeq
    val small = run(1L << 10)
    assert(small === run(1L << 20))
    assert(small === run(997L))
  }

  test("tumbling window + watermark: windows close when watermark passes end+delay") {
    val in = MemoryStream[String]
    val counts = EventTimeOps.windowedWordCount(
      EventTimeOps.parseTimestampedWords(in.toDF()))
    val q = counts.writeStream.format("memory").queryName("wc_out")
      .outputMode("append").start()
    // window [0,10s): hello x2, world x1; one disordered-within-bound record
    in.addData("1000,hello", "3000,world", "2000,hello")
    q.processAllAvailable()
    // advance watermark past 10s window end + 10s delay => close window 0
    in.addData("25000,later")
    q.processAllAvailable()
    val rows = spark.table("wc_out")
      .select(unix_micros(col("w_start")).as("w"), col("word"), col("cnt"))
      .as[(Long, String, Long)].collect().toSet
    assert(rows === Set((0L, "hello", 2L), (0L, "world", 1L)))
    q.stop()
  }

  test("W4 allowed lateness: a late-but-allowed record re-fires a revised window (update mode)") {
    // The observable behavior that distinguishes allowedLateness from a
    // longer watermark (ref EventTimeWordCountDebug.java:103): a window
    // result is emitted, then a record arrives late — below max event
    // time seen, but within the delay that folds disorder + lateness —
    // and the REVISED count is re-emitted, superseding the first.
    val in = MemoryStream[String]
    val counts = EventTimeOps.windowedWordCount(
      EventTimeOps.parseTimestampedWords(in.toDF()))
    val perBatch = scala.collection.mutable.ArrayBuffer.empty[Set[(Long, String, Long)]]
    val q = counts.writeStream.outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        perBatch += b.select(unix_micros(col("w_start")) / 1000000,
            col("word"), col("cnt"))
          .as[(Double, String, Long)].collect()
          .map(r => (r._1.toLong, r._2, r._3)).toSet
        ()
      }.start()

    in.addData("12000,hello")            // window [10,20): first emission cnt=1
    q.processAllAvailable()
    in.addData("25000,other")            // watermark -> 15s; [10,20) still open
    q.processAllAvailable()
    in.addData("13000,hello")            // late (13 < max-seen 25) but allowed
    q.processAllAvailable()
    q.stop()

    val fired = perBatch.filter(_.nonEmpty)
    assert(fired.head === Set((10L, "hello", 1L)))        // initial firing
    assert(fired.last === Set((10L, "hello", 2L)))        // revised firing
    assert(fired.flatten.count(_._2 == "hello") === 2)    // exactly one re-fire
  }

  test("late splitter: records below watermark route to the late side") {
    val splitter = new EventTimeOps.LateSplitter(delayMs = 10000, tsCol = "ts")
    val onTime = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val late = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val in = MemoryStream[String]
    val parsed = EventTimeOps.parseTimestampedWords(in.toDF())
    def collect(buf: scala.collection.mutable.ArrayBuffer[(Long, String)])
               (df: org.apache.spark.sql.DataFrame, id: Long): Unit = {
      buf ++= df.select(unix_micros(col("ts")) / 1000, col("word"))
        .as[(Double, String)].collect().map(r => (r._1.toLong, r._2))
      ()
    }
    val q = splitter.writer(parsed)(
      onTime = collect(onTime), late = collect(late)).start()
    // batch 1: no watermark yet, everything on time; wm -> 30000-10000=20000
    in.addData("30000,a", "25000,b")
    q.processAllAvailable()
    // batch 2: 15000 < wm 20000 -> late; 21000 >= wm -> on time
    in.addData("15000,too_late", "21000,ok")
    q.processAllAvailable()
    q.stop()
    assert(onTime.map(_._2).toSet === Set("a", "b", "ok"))
    assert(late.map(_._2).toSeq === Seq("too_late"))
    assert(splitter.currentWatermarkUs === 20000L * 1000)
  }

  test("rolling word count (update mode) matches Flink keyBy().sum() final counts") {
    val in = MemoryStream[String]
    val q = WordCountStreams.rollingWordCount(in.toDF())
      .writeStream.format("memory").queryName("roll_out").outputMode("complete").start()
    in.addData("to be or not", "to be")
    q.processAllAvailable()
    in.addData("to be")
    q.processAllAvailable()
    val counts = spark.table("roll_out").as[(String, Long)].collect().toMap
    assert(counts === Map("to" -> 3L, "be" -> 3L, "or" -> 1L, "not" -> 1L))
    q.stop()
  }

  test("advanced word count normalizes and drops stopwords") {
    val in = MemoryStream[String]
    val q = WordCountStreams.advancedWordCount(in.toDF())
      .writeStream.format("memory").queryName("adv_out").outputMode("complete").start()
    in.addData("The QUICK brown-fox!", "the quick dog")
    q.processAllAvailable()
    val counts = spark.table("adv_out").as[(String, Long)].collect().toMap
    // "the" is a stopword; "brown-fox" normalizes to "brownfox"
    assert(counts === Map("quick" -> 2L, "brownfox" -> 1L, "dog" -> 1L))
    q.stop()
  }
}
