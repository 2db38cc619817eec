package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.json.JsonDiff

/** The reference's keyed-state quartet (SURVEY.md §2.6 T1-T4),
  * re-expressed as `flatMapGroupsWithState` folds.
  *
  * Semantics preserved from the reference:
  *  - one emission per input record (T1/T2), 0-or-1 per record (T3/T4);
  *  - per-key state survives across micro-batches via the StateStore
  *    (checkpointed — the analog of Flink's keyed state backend);
  *  - records within a batch are folded in (timestamp, seq) order to
  *    reproduce Flink's arrival-order processing.
  *
  * Scale notes: state is partitioned by the grouping key across
  * executors; each micro-batch shuffles only that batch's records.
  * T2's unbounded list state is faithful to the reference
  * (UserEventListState has no eviction) — production deployments should
  * bound it with `GroupStateTimeout` / state TTL.
  */
object StatefulOps {

  /** T1 — running click counter (UserClickCounter.java:39-61). */
  def clickCounts(clicks: Dataset[Click]): Dataset[ClickCount] = {
    import clicks.sparkSession.implicits._
    clicks.groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: String, rows: Iterator[Click], state: GroupState[Int]) =>
          var n = state.getOption.getOrElse(0)
          val out = rows.toSeq.sortBy(_.seq).map { _ =>
            n += 1
            ClickCount(userId, n, s"$userId has clicked $n times.")
          }
          state.update(n)
          out.iterator
      }
  }

  /** T2 — list-state accumulation, emitting the full snapshot per input
    * (UserEventListState.java:40-64). */
  def eventLists(events: Dataset[UserEvent]): Dataset[EventListSnapshot] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: String, rows: Iterator[UserEvent], state: GroupState[List[String]]) =>
          var acc = state.getOption.getOrElse(Nil)
          val out = rows.toSeq.sortBy(_.seq).map { e =>
            acc = acc :+ e.event
            EventListSnapshot(userId, acc)
          }
          state.update(acc)
          out.iterator
      }
  }

  /** T3 — fraud detector (FraudDetectorExample.java:71-121): keep
    * high-value txns (>100) from a sliding lookback, alert on >=3 with
    * a throttle window, folding per record in timestamp order. */
  def fraudAlerts(txns: Dataset[Transaction],
                  threshold: Double = 100.0,
                  lookbackMs: Long = 10 * 60 * 1000,
                  throttleMs: Long = 10 * 60 * 1000,
                  minCount: Int = 3): Dataset[FraudAlert] = {
    import txns.sparkSession.implicits._
    txns.groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: String, rows: Iterator[Transaction], state: GroupState[FraudState]) =>
          var st = state.getOption.getOrElse(FraudState(Nil, None))
          val out = scala.collection.mutable.ArrayBuffer.empty[FraudAlert]
          rows.toSeq.sortBy(_.timestamp).foreach { tx =>
            // (a) track high-value txns (ref :92-94)
            if (tx.amount > threshold)
              st = st.copy(recent = st.recent :+ tx)
            // (b) evict entries older than the lookback (ref :96-105)
            st = st.copy(recent = st.recent.filter(_.timestamp >= tx.timestamp - lookbackMs))
            // (c) alert on >= minCount survivors, throttled (ref :107-118)
            val throttled = st.lastAlertTime.exists(last => tx.timestamp - last <= throttleMs)
            if (st.recent.size >= minCount && !throttled) {
              out += FraudAlert(userId, tx.timestamp, st.recent.size,
                s"FRAUD ALERT: $userId made ${st.recent.size} high-value transactions within window (latest at ${tx.timestamp})")
              st = st.copy(lastAlertTime = Some(tx.timestamp))
            }
          }
          state.update(st)
          out.iterator
      }
  }

  /** T4+T5 — per-key CDC: diff each record's JSON against the previous
    * one; first occurrence stores silently; unchanged re-delivery emits
    * nothing (TradeChangeDetectionJob.java:67-113). */
  def tradeChanges(trades: Dataset[Trade]): Dataset[TradeChange] = {
    import trades.sparkSession.implicits._
    trades.groupByKey(_.id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (id: String, rows: Iterator[Trade], state: GroupState[String]) =>
          var prev = state.getOption.orNull
          val out = scala.collection.mutable.ArrayBuffer.empty[TradeChange]
          rows.toSeq.sortBy(_.seq).foreach { t =>
            if (prev == null) {
              prev = t.payload // first occurrence: store silently (ref :89-92)
            } else {
              val diffs = JsonDiff.diffJson(prev, t.payload)
              if (diffs.nonEmpty) { // unchanged resend emits nothing (ref :109-111)
                out += TradeChange(id, t.seq, diffs)
                prev = t.payload
              }
            }
          }
          if (prev != null) state.update(prev)
          out.iterator
      }
  }
}
