package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of the batch `a5_session_windows` query (ref has no
  * session assigner — SURVEY.md §2.8 extension): per-user activity
  * sessions with a gap timeout, emitted as they CLOSE rather than in a
  * nightly batch. Spark's built-in `session_window` is the whole
  * operator — a keyed, watermark-driven, merge-on-overlap window whose
  * state per open session is (start, end) regardless of event count —
  * so the twin is a declarative groupBy, not a hand-rolled state
  * machine (the StatefulProcessor budget is spent where Spark has no
  * native operator: the funnel, the CDC diff).
  *
  * Gap semantics are aligned to the batch form's gaps-and-islands rule
  * (`EventQueries.sessionWindows`): there a NEW session starts only
  * when the gap STRICTLY exceeds the timeout. `session_window` agrees
  * bit-for-bit, because Spark merges sessions whose windows TOUCH at
  * the boundary (merge while newStart ≤ currentEnd, the end treated
  * inclusively by the session-merge iterator) — an event at exactly
  * prev+gap extends the session, one microsecond later splits. Both
  * edges are spec-asserted on exact-gap fixtures in
  * `StreamSessionsSpec`, so a Spark-side change of the boundary rule
  * fails loud here instead of silently disagreeing with the batch
  * form.
  *
  * Append mode emits a session only once the WATERMARK passes its
  * close — late events inside the allowed delay still merge/extend;
  * beyond it they are dropped, the standard watermark contract (W1-W5
  * coverage in EventTimeOps). Scale: state is per-OPEN-session (two
  * timestamps + the running agg), shuffled once on the session key;
  * user cardinality bounds the store, never history length. */
object StreamSessions {

  /** events: (user_id long, event_id long, ts_us long) streaming frame.
    * Emits one row per closed session: (user_id, sess_start_us,
    * sess_end_us, n_events) — the batch query's columns minus the
    * per-user ordinal (a running rank has no streaming meaning; join
    * keys at 100 TB should be (user_id, sess_start_us), which is
    * stable under replay in both forms). */
  def sessions(events: DataFrame, gapUs: Long = 30L * 60 * 1000000,
               watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", watermarkDelay)
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapUs microseconds"))
      .agg(min(col("ts_us")).as("sess_start_us"),
           max(col("ts_us")).as("sess_end_us"),
           count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sess_start_us"), col("sess_end_us"),
        col("n_events"))
}
