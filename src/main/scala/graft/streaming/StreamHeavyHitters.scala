package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of the frequent-items tier
  * (`x_heavy_shingles_topk`): per-tumbling-window top-k items over an
  * unbounded stream — the live "what's trending in the ingest"
  * monitor (hot shingles = emerging boilerplate, hot tokens = a
  * misbehaving source). Declarative: watermark + window groupBy with
  * `approx_top_k` (DataSketches ItemsSketch), whose per-open-window
  * state is maxTracked-bounded however many items the window sees —
  * the exact per-(window, item) count the naive form keeps is
  * VOCABULARY-sized per window, the unbounded-state anti-shape on a
  * text stream.
  *
  * Sketch contract (what `StreamHeavyHittersSpec` pins): while a
  * window's distinct item count stays <= maxTracked the sketch is
  * EXACT — counts equal the true counts and recall is total — and
  * under capacity pressure it keeps the classic frequent-items
  * guarantee (no item whose true count exceeds the sketch's error
  * bound is missed; estimates may exceed true counts, never by more
  * than the bound). Tie order within equal counts is arbitrary, so
  * consumers rank by (est_count, item), not array position, when
  * determinism matters.
  *
  * Append mode: a window emits once the watermark passes its end;
  * late-within-delay folds into the open sketch, too-late drops (the
  * W1-W5 contract). State: one sketch per open window, shuffled once
  * on the window key. */
object StreamHeavyHitters {

  /** events: streaming frame with (ts_us long, item string). One row
    * per (closed window, top-k entry): (win_start_us, rank, item,
    * est_count). */
  def windowed(events: DataFrame,
               windowLen: String = "10 seconds",
               watermarkDelay: String = "5 seconds",
               k: Int = 10,
               maxTracked: Int = 8192): DataFrame =
    events
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLen))
      .agg(expr(s"approx_top_k(item, $k, $maxTracked)").as("topk"))
      .select(unix_micros(col("window.start")).as("win_start_us"),
        posexplode(col("topk")))
      .select(col("win_start_us"), col("pos").as("rank"),
        col("col.item").as("item"), col("col.count").as("est_count"))
}
