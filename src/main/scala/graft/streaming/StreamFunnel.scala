package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Event funnel input: one user action with its event timestamp; `seq`
  * breaks arrival-order ties like the other streaming records. */
case class FunnelEvent(userId: Long, tsUs: Long, eventType: String, seq: Long)

/** Emitted whenever a user ADVANCES a funnel stage: the new stage and
  * the timestamps that got them there (nulls for stages not reached). */
case class FunnelAdvance(userId: Long, stage: Int,
                         s1Us: Option[Long], s2Us: Option[Long],
                         s3Us: Option[Long])

/** Per-user funnel progress (state): stage reached + stage timestamps. */
case class FunnelState(stage: Int, s1Us: Option[Long],
                       s2Us: Option[Long], s3Us: Option[Long])

/** Streaming twin of the batch `a11_funnel` query: each user's strictly
  * ordered view → click → purchase progress as a keyed state machine —
  * the per-user state is THREE LONGS regardless of history length,
  * versus the batch form's per-user event array. One row is emitted per
  * stage ADVANCE (0-or-1 per input record), so downstream sees funnel
  * conversions as they happen.
  *
  * Equivalence contract (spec-asserted in `StreamFunnelSpec`): when
  * each user's events arrive in event-time order, the greedy state
  * machine lands on exactly the batch query's min-chain stages — the
  * first qualifying event in ts order IS `min(ts)` over qualifying
  * events. Within a micro-batch, records fold in (tsUs, seq) order
  * (the house arrival-order discipline); ACROSS batches an
  * out-of-order event that predates an already-taken stage cannot
  * retract it — the same arrival-order caveat the T4 CDC operator
  * documents for Kafka-offset order. Production deployments that need
  * cross-batch reordering put a watermark-sorted stage in front or run
  * the batch query over the closed window.
  *
  * Scale: state is (int, 3×long) per user, shuffled once per
  * micro-batch on userId; there is no per-user history to grow, so the
  * state store is user-cardinality-bounded — the shape that makes
  * funnels viable on an unbounded stream where the batch array form
  * could not be. */
object StreamFunnel {

  private val steps = Vector("view", "click", "purchase")

  /** Fold one user's in-order records into the state machine, returning
    * the advances to emit and the final state. */
  private[graft] def advance(st: FunnelState,
                                 events: Seq[FunnelEvent]): (Seq[FunnelAdvance], FunnelState) = {
    var s = st
    val out = Seq.newBuilder[FunnelAdvance]
    events.foreach { e =>
      if (s.stage < steps.length && e.eventType == steps(s.stage)) {
        val prevTs = s.stage match {
          case 0 => None
          case 1 => s.s1Us
          case 2 => s.s2Us
        }
        // strict > between stages — the batch query's tie rule
        if (prevTs.forall(e.tsUs > _)) {
          s = s.stage match {
            case 0 => FunnelState(1, Some(e.tsUs), None, None)
            case 1 => s.copy(stage = 2, s2Us = Some(e.tsUs))
            case 2 => s.copy(stage = 3, s3Us = Some(e.tsUs))
          }
          out += FunnelAdvance(e.userId, s.stage, s.s1Us, s.s2Us, s.s3Us)
        }
      }
    }
    (out.result(), s)
  }

  /** The streaming operator: one `FunnelAdvance` per stage transition. */
  def advances(events: Dataset[FunnelEvent]): Dataset[FunnelAdvance] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[FunnelEvent], state: GroupState[FunnelState]) =>
          val st = state.getOption.getOrElse(FunnelState(0, None, None, None))
          val (out, next) = advance(st, rows.toSeq.sortBy(e => (e.tsUs, e.seq)))
          state.update(next)
          out.iterator
      }
  }

  /** Spark-4 `transformWithState` form: the same [[advance]] fold
    * behind a named ValueState — the StatefulV2 parity the T1-T4
    * quartet keeps, here with the funnel's own production dial: a
    * non-NONE `ttl` expires a user's stalled funnel progress
    * `ttlDuration` after its last advance (abandoned-funnel state is
    * the unbounded term at 100 TB users; the T2 precedent —
    * store-enforced RocksDB expiry, requires processing-time mode,
    * selected automatically like [[StatefulV2.eventLists]]). */
  class FunnelProcessor(ttl: TTLConfig)
      extends StatefulProcessor[Long, FunnelEvent, FunnelAdvance] {
    def this() = this(TTLConfig.NONE)
    @transient private var progress: ValueState[FunnelState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      progress = getHandle.getValueState[FunnelState]("funnelProgress",
        Encoders.product[FunnelState], ttl)

    override def handleInputRows(userId: Long, rows: Iterator[FunnelEvent],
                                 timers: TimerValues): Iterator[FunnelAdvance] = {
      val st = if (progress.exists()) progress.get()
               else FunnelState(0, None, None, None)
      val (out, next) = advance(st, rows.toSeq.sortBy(e => (e.tsUs, e.seq)))
      progress.update(next)
      out.iterator
    }
  }

  def advancesV2(events: Dataset[FunnelEvent],
                 ttl: TTLConfig = TTLConfig.NONE): Dataset[FunnelAdvance] = {
    import events.sparkSession.implicits._
    val mode = if (ttl == TTLConfig.NONE) TimeMode.None() else TimeMode.ProcessingTime()
    events.groupByKey(_.userId)
      .transformWithState(new FunnelProcessor(ttl), mode, OutputMode.Append())
  }
}
