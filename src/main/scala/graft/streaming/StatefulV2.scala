package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}
import graft.json.JsonDiff

/** Spark 4 `transformWithState` forms of the reference's keyed state
  * (SURVEY.md §2.6, §2.9): named ValueState/ListState registered on the
  * StatefulProcessorHandle — the direct analog of Flink's state
  * descriptors registered in `open()` (UserClickCounter.java:45-49,
  * UserEventListState.java:45-49).
  *
  * Differences vs the flatMapGroupsWithState forms in StatefulOps:
  *  - state variables are named + independently typed (like Flink's
  *    descriptors) instead of a single state case class;
  *  - ListState appends without rewriting the whole list (the
  *    UserEventListState scale concern, SURVEY §7 known-hard #5);
  *  - TTLConfig gives production state expiry for free.
  */
object StatefulV2 {

  /** T1 — running click counter with a named ValueState[Int]
    * (ref UserClickCounter.java:39-61). */
  class ClickCountProcessor extends StatefulProcessor[String, Click, ClickCount] {
    @transient private var count: ValueState[Int] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      count = getHandle.getValueState[Int]("clickCount", Encoders.scalaInt,
        TTLConfig.NONE)

    override def handleInputRows(userId: String, rows: Iterator[Click],
                                 timers: TimerValues): Iterator[ClickCount] = {
      var n = if (count.exists()) count.get() else 0
      val out = rows.toSeq.sortBy(_.seq).map { _ =>
        n += 1
        ClickCount(userId, n, s"$userId has clicked $n times.")
      }
      count.update(n)
      out.iterator
    }
  }

  def clickCounts(clicks: Dataset[Click]): Dataset[ClickCount] = {
    import clicks.sparkSession.implicits._
    clicks.groupByKey(_.userId)
      .transformWithState(new ClickCountProcessor,
        TimeMode.None(), OutputMode.Append())
  }

  /** T2 — event-list accumulation with a named ListState[String]:
    * appendValue is an O(1) state append, no full-list rewrite
    * (ref UserEventListState.java:40-64).
    *
    * `ttl`: the production bound for T2's otherwise-unbounded per-key
    * list (SURVEY §7 known-hard #5) — a non-NONE TTLConfig makes the
    * state store expire each appended entry `ttlDuration` after its
    * write, so an idle key's list drains to empty instead of growing
    * for the life of the query. Expiry is enforced by the store itself
    * (RocksDB TTL column tracking), not a user-code sweep; it requires
    * TimeMode.ProcessingTime, which [[eventLists]] selects
    * automatically. Golden-tested in `StatefulV2Spec`. */
  class EventListProcessor(ttl: TTLConfig)
      extends StatefulProcessor[String, UserEvent, EventListSnapshot] {
    def this() = this(TTLConfig.NONE)
    @transient private var events: ListState[String] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      events = getHandle.getListState[String]("events", Encoders.STRING, ttl)

    override def handleInputRows(userId: String, rows: Iterator[UserEvent],
                                 timers: TimerValues): Iterator[EventListSnapshot] = {
      val out = rows.toSeq.sortBy(_.seq).map { e =>
        events.appendValue(e.event)
        EventListSnapshot(userId, events.get().toSeq)
      }
      out.iterator
    }
  }

  def eventLists(events: Dataset[UserEvent],
                 ttl: TTLConfig = TTLConfig.NONE): Dataset[EventListSnapshot] = {
    import events.sparkSession.implicits._
    val timeMode =
      if (ttl == TTLConfig.NONE) TimeMode.None() else TimeMode.ProcessingTime()
    events.groupByKey(_.userId)
      .transformWithState(new EventListProcessor(ttl), timeMode,
        OutputMode.Append())
  }

  /** T3 — fraud detector with the reference's EXACT dual-state shape:
    * a ListState of recent transactions plus a ValueState of the last
    * alert time (FraudDetectorExample.java:73-74) — unlike the
    * flatMapGroupsWithState form, which packs both into one case class.
    * Eviction rewrites the list (like the reference's :96-105 loop);
    * alerting is throttled (:107-118). */
  class FraudProcessor(threshold: Double, lookbackMs: Long, throttleMs: Long,
                       minCount: Int)
      extends StatefulProcessor[String, Transaction, FraudAlert] {
    @transient private var recent: ListState[Transaction] = _
    @transient private var lastAlert: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      implicit val txEnc = org.apache.spark.sql.Encoders.product[Transaction]
      recent = getHandle.getListState[Transaction]("recentTransactions",
        txEnc, TTLConfig.NONE)
      lastAlert = getHandle.getValueState[Long]("lastAlertTime",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(userId: String, rows: Iterator[Transaction],
                                 timers: TimerValues): Iterator[FraudAlert] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[FraudAlert]
      rows.toSeq.sortBy(_.timestamp).foreach { tx =>
        if (tx.amount > threshold) recent.appendValue(tx)
        val survivors = recent.get().toSeq
          .filter(_.timestamp >= tx.timestamp - lookbackMs)
        // the store rejects empty list writes — clear() instead
        if (survivors.isEmpty) recent.clear()
        else recent.put(survivors.toArray)
        val throttled = lastAlert.exists() &&
          tx.timestamp - lastAlert.get() <= throttleMs
        if (survivors.size >= minCount && !throttled) {
          out += FraudAlert(userId, tx.timestamp, survivors.size,
            s"FRAUD ALERT: $userId made ${survivors.size} high-value transactions within window (latest at ${tx.timestamp})")
          lastAlert.update(tx.timestamp)
        }
      }
      out.iterator
    }
  }

  def fraudAlerts(txns: Dataset[Transaction],
                  threshold: Double = 100.0,
                  lookbackMs: Long = 10 * 60 * 1000,
                  throttleMs: Long = 10 * 60 * 1000,
                  minCount: Int = 3): Dataset[FraudAlert] = {
    import txns.sparkSession.implicits._
    txns.groupByKey(_.userId)
      .transformWithState(
        new FraudProcessor(threshold, lookbackMs, throttleMs, minCount),
        TimeMode.None(), OutputMode.Append())
  }

  /** T4 — per-key CDC with a named ValueState[String] holding the
    * previous payload (ref TradeChangeDetectionJob.java:67-113),
    * completing the V2 quartet: first occurrence stores silently,
    * identical re-delivery emits nothing, otherwise emit the JSON field
    * diff and advance the stored payload. Same semantics as
    * StatefulOps.tradeChanges (flatMapGroupsWithState form). */
  class CdcProcessor extends StatefulProcessor[String, Trade, TradeChange] {
    @transient private var prev: ValueState[String] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      prev = getHandle.getValueState[String]("prevPayload", Encoders.STRING,
        TTLConfig.NONE)

    override def handleInputRows(id: String, rows: Iterator[Trade],
                                 timers: TimerValues): Iterator[TradeChange] = {
      var p = if (prev.exists()) prev.get() else null
      val out = scala.collection.mutable.ArrayBuffer.empty[TradeChange]
      rows.toSeq.sortBy(_.seq).foreach { t =>
        if (p == null) {
          p = t.payload // first occurrence: store silently (ref :89-92)
        } else {
          val diffs = JsonDiff.diffJson(p, t.payload)
          if (diffs.nonEmpty) { // unchanged resend emits nothing (ref :109-111)
            out += TradeChange(id, t.seq, diffs)
            p = t.payload
          }
        }
      }
      if (p != null) prev.update(p)
      out.iterator
    }
  }

  def tradeChanges(trades: Dataset[Trade]): Dataset[TradeChange] = {
    import trades.sparkSession.implicits._
    trades.groupByKey(_.id)
      .transformWithState(new CdcProcessor,
        TimeMode.None(), OutputMode.Append())
  }
}
