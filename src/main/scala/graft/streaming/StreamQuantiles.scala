package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of the quantile-sketch tier (q_price_quantiles_*,
  * SURVEY.md §2.8 extension): per-tumbling-window quartiles of a
  * continuous metric — the live latency/price-percentile monitor every
  * ingestion dashboard wants. Declarative: watermark + window groupBy
  * with `approx_percentile`, whose Greenwald-Khanna buffer is the
  * per-window STATE — O((1/eps)·log(eps·n)) per open window however
  * many events land in it. The exact-percentile form is not offered
  * here at all: its counts-map state grows with every distinct value
  * a window sees (BASELINE.md round 10 measured the batch blowup),
  * which in an unbounded stream is the collect_list anti-shape.
  *
  * Determinism caveat, deliberate: GK summaries are merge-order
  * dependent, so the streamed answer may differ from a batch replay
  * in the last summary entry — both still carry the rank-error
  * contract |rank(v)/n - q| <= eps, which is what
  * `StreamQuantilesSpec` pins (golden row-equality would pin merge
  * topology, not semantics).
  *
  * Append mode: a window emits once the watermark passes its end;
  * late events inside the delay fold into the open summary, beyond it
  * they drop (the W1-W5 contract). Scale: state is one summary per
  * open window (per key if keyed upstream), shuffled once on the
  * window key. */
object StreamQuantiles {

  /** events: streaming frame with (ts_us long, value double). One row
    * per closed window: (win_start_us, q1, median, q3, n). */
  def windowed(events: DataFrame,
               windowLen: String = "10 seconds",
               watermarkDelay: String = "5 seconds",
               accuracy: Int = 1000): DataFrame =
    events
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLen))
      .agg(
        expr(s"approx_percentile(value, array(0.25D, 0.5D, 0.75D), $accuracy)")
          .as("qs"),
        count(lit(1)).as("n"))
      .select(
        unix_micros(col("window.start")).as("win_start_us"),
        col("qs").getItem(0).as("q1"),
        col("qs").getItem(1).as("median"),
        col("qs").getItem(2).as("q3"),
        col("n"))
}
