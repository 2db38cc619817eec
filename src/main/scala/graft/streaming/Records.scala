package graft.streaming

/** Typed records for the streaming operators — the Spark encoders of the
  * reference's POJOs/tuples (SURVEY.md §1).
  *
  * `seq` fields model arrival order: Flink processes records one at a
  * time in arrival order, while `flatMapGroupsWithState` hands each key
  * an unordered batch iterator — the operators sort by (timestamp, seq)
  * to reproduce the per-record semantics (SURVEY.md §7 known-hard #2).
  */

/** (userId, action) click — ref UserClickCounter.java:19-26. */
case class Click(userId: String, seq: Long, action: String)

/** (userId, event) — ref UserEventListState.java:22-28. */
case class UserEvent(userId: String, seq: Long, event: String)

/** Transaction — ref FraudDetectorExample.java:22-39. */
case class Transaction(userId: String, amount: Double, timestamp: Long)

/** Raw keyed JSON payload — ref TradeChangeDetectionJob's Kafka value,
  * keyed by $.id (TradeChangeDetectionJob.java:56-64). */
case class Trade(id: String, seq: Long, payload: String)

// ---- outputs ----

case class ClickCount(userId: String, clicks: Int, message: String)

case class EventListSnapshot(userId: String, events: Seq[String])

case class FraudAlert(userId: String, timestamp: Long, recentCount: Int,
                      message: String)

case class TradeChange(tradeId: String, seq: Long,
                       diffs: Seq[graft.json.DiffEntry])

// ---- state ----

/** Fraud detector state: recent high-value txns + last alert time
  * (ref FraudDetectorExample.java:73-74 ListState+ValueState). */
case class FraudState(recent: List[Transaction], lastAlertTime: Option[Long])
