package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

/** Event-time operators (SURVEY.md §2.5): watermarked tumbling-window
  * aggregation and the late-data side-output splitter — the reference's
  * EventTimeWordCountDebug pipeline.
  *
  * Watermark semantics match the reference's generator exactly
  * (max event time seen minus the disorder bound,
  * EventTimeWordCountDebug.java:52-71); Spark maintains it per
  * micro-batch instead of per record. The reference's
  * `allowedLateness(5s)` is folded into the watermark delay
  * (disorder 5 s + lateness 5 s = 10 s) per SURVEY.md §2.5 W4.
  */
object EventTimeOps {

  /** Parse the reference's `"timestamp,word"` socket protocol
    * (EventTimeWordCountDebug.java:34-42) into (ts TIMESTAMP, word). */
  def parseTimestampedWords(lines: DataFrame): DataFrame =
    lines.select(
      timestamp_millis(trim(element_at(split(col("value"), ","), 1)).cast("long")).as("ts"),
      trim(element_at(split(col("value"), ","), 2)).as("word"))

  /** Tumbling event-time window count with watermark
    * (EventTimeWordCountDebug.java:100-105). `delay` covers disorder +
    * allowed lateness. Run with outputMode("append"): windows finalize
    * when the watermark passes window end + lateness. */
  def windowedWordCount(tsWords: DataFrame,
                        windowLen: String = "10 seconds",
                        delay: String = "10 seconds"): DataFrame =
    tsWords
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), windowLen), lower(col("word")).as("word"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("w_start"), col("word"), col("cnt"))

  /** W5 — late-data side output splitter. Spark has no per-operator side
    * outputs; this runs in `foreachBatch` and maintains the watermark the
    * same way the reference's generator does (max event time seen minus
    * the delay, suppressed until the first event —
    * EventTimeWordCountDebug.java:52-71) and the same way Spark gates
    * state eviction: the watermark used for batch N is derived from data
    * seen through batch N-1.
    *
    * At scale the split is a narrow per-partition filter — no shuffle;
    * the watermark is a driver-side scalar shipped with the task closure.
    * The only driver action per batch is a single `max(ts)` aggregate.
    */
  final class LateSplitter(delayMs: Long, tsCol: String = "ts") extends Serializable {
    @volatile private var watermarkUs: Long = Long.MinValue

    /** Current watermark in epoch µs (MinValue until the first event). */
    def currentWatermarkUs: Long = watermarkUs

    /** Split one micro-batch into (onTime, late) against the watermark,
      * then advance it. Call from `foreachBatch`. */
    def split(batch: DataFrame): (DataFrame, DataFrame) = {
      val wm = watermarkUs
      val isLate = unix_micros(col(tsCol)) < lit(wm)
      val onTime = batch.filter(!isLate)
      val late = batch.filter(isLate)
      val maxUs = batch.agg(max(unix_micros(col(tsCol)))).collect()(0)
      if (!maxUs.isNullAt(0))
        watermarkUs = math.max(watermarkUs, maxUs.getLong(0) - delayMs * 1000)
      (onTime, late)
    }

    /** Wire a stream through the splitter to two labeled sinks — the
      * analog of the reference's WINDOW_COUNTS / TOO_LATE prints
      * (EventTimeWordCountDebug.java:107-108). */
    def writer(tsWords: DataFrame)
              (onTime: (DataFrame, Long) => Unit,
               late: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
      tsWords.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.persist()
        try {
          val (ok, lateDf) = split(batch)
          late(lateDf, batchId)
          onTime(ok, batchId)
        } finally batch.unpersist()
      }
  }
}
