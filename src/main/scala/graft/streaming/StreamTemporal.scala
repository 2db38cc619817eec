package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** One side of the temporal join: a VERSION row of the table being
  * enriched against — (key, event-time, version id, payload). The
  * payload is a single string; callers with wider rows JSON/CSV-encode
  * (the join buffers it opaquely, the shape keeps state rows narrow). */
final case class TemporalVersion(key: Long, ts: Timestamp,
                                 versionId: Long, payload: String)

/** The probe side: an event asking "which version was visible at my
  * event time?" */
final case class TemporalProbe(key: Long, ts: Timestamp, probeId: Long)

/** One answered probe: the latest version with version.ts <= probe.ts
  * (ties across versions resolve by versionId — deterministic). Probes
  * with no visible version emit nothing (inner semantics, the batch
  * t9 contract). */
final case class TemporalMatch(key: Long, probeId: Long, probeTsMs: Long,
                               versionId: Long, payload: String)

private[streaming] final case class TemporalIn(key: Long, ts: Timestamp,
  isVersion: Boolean, versionId: Long, payload: String, probeId: Long)
private[streaming] final case class VersionRec(tsMs: Long, versionId: Long,
  payload: String)
private[streaming] final case class PendingProbe(probeId: Long, tsMs: Long)

/** EVENT-TIME temporal table join in the streaming runtime — Flink's
  * `FOR SYSTEM_TIME AS OF` between two live streams, the enrichment
  * the reference's stack is best known for and the one join Spark has
  * no native operator for (stream-stream joins match RANGES of rows;
  * a temporal join matches exactly the LATEST version at or before
  * each probe — `StreamRules` is the processing-time approximation,
  * always joining the current table).
  *
  * Built on `transformWithState` with EVENT-TIME TIMERS — the piece of
  * the Spark-4 state API nothing else in this repo needed: both tagged
  * sides shuffle once on the key; versions append to a ListState;
  * probes buffer and register a timer at probe-ts+1; when the
  * WATERMARK crosses it ([[StatefulProcessor.handleExpiredTimer]])
  * the answer is final — any version that could still change it would
  * have version-ts <= probe-ts < watermark, i.e. be late and dropped
  * before the operator. That is the correctness argument, and it is
  * also the difference from the batch form (`AsOf.lastRightRow`, t9):
  * a version arriving LATER than the watermark delay is gone here,
  * answered-without-it — the standard watermark trade, spec-pinned
  * rather than hidden.
  *
  * State is BOUNDED by the watermark on both sides: pending probes
  * drain as timers fire, and the version list prunes to "the newest
  * version at or below the watermark plus everything above it" — the
  * dominance rule: every future probe has ts >= watermark (late ones
  * drop), so any older version is beaten by that newest-visible one
  * for every probe still to come. Per key the steady state is one
  * version plus the in-horizon churn, never the version history.
  * The prune runs from BOTH sides' timers: probe timers, and a
  * cleanup timer registered on version arrival — so a key that only
  * ever receives versions (no probes) still converges to its one
  * dominant version instead of hoarding history.
  */
object StreamTemporal {

  class TemporalJoinProcessor
      extends StatefulProcessor[Long, TemporalIn, TemporalMatch] {
    @transient private var versions: ListState[VersionRec] = _
    @transient private var pending: ListState[PendingProbe] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      versions = getHandle.getListState[VersionRec]("versions",
        Encoders.product[VersionRec], TTLConfig.NONE)
      pending = getHandle.getListState[PendingProbe]("pending",
        Encoders.product[PendingProbe], TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[TemporalIn],
                                 timers: TimerValues): Iterator[TemporalMatch] = {
      var maxVersionTs = Long.MinValue
      rows.foreach { r =>
        if (r.isVersion) {
          versions.appendValue(VersionRec(r.ts.getTime, r.versionId, r.payload))
          maxVersionTs = math.max(maxVersionTs, r.ts.getTime)
        } else {
          pending.appendValue(PendingProbe(r.probeId, r.ts.getTime))
          // fires once the watermark passes the probe's time — at that
          // point no version with ts <= probe.ts can still arrive
          getHandle.registerTimer(r.ts.getTime + 1)
        }
      }
      // cleanup timer for VERSION-ONLY keys (one per batch, at the
      // batch's newest version ts): without it the dominance prune in
      // handleExpiredTimer never runs for a key that receives versions
      // but no probes, and that key would accumulate its entire version
      // history — the unbounded-state hole the class doc's bound must
      // actually hold against. Probe timers already cover mixed keys;
      // a duplicate expiry timestamp is a no-op in the timer registry.
      if (maxVersionTs != Long.MinValue)
        getHandle.registerTimer(maxVersionTs + 1)
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, timers: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[TemporalMatch] = {
      val wm = timers.getCurrentWatermarkInMs()
      val vs = versions.get().toArray
      val (ready, still) = pending.get().toArray.partition(_.tsMs < wm)
      val out = ready.sortBy(p => (p.tsMs, p.probeId)).flatMap { p =>
        val visible = vs.filter(_.tsMs <= p.tsMs)
        if (visible.isEmpty) None
        else {
          val w = visible.maxBy(v => (v.tsMs, v.versionId))
          Some(TemporalMatch(key, p.probeId, p.tsMs, w.versionId, w.payload))
        }
      }
      if (still.isEmpty) pending.clear() else pending.put(still)
      // dominance prune (see class doc): keep the newest version at or
      // below the watermark plus everything above it
      val below = vs.filter(_.tsMs <= wm)
      if (below.length > 1) {
        val cut = below.maxBy(v => (v.tsMs, v.versionId))
        versions.put(vs.filter(v => v.tsMs > wm) :+ cut)
      }
      out.iterator
    }
  }

  /** Join two live streams temporally: each probe is answered with the
    * latest version at or before its event time, once the watermark
    * makes that answer final. `delay` is the shared lateness bound —
    * versions later than it are answered-around (the watermark trade).
    */
  def join(versions: Dataset[TemporalVersion], probes: Dataset[TemporalProbe],
           delay: String = "10 minutes"): Dataset[TemporalMatch] = {
    val spark = versions.sparkSession
    import spark.implicits._
    val tagged = versions
      .map(v => TemporalIn(v.key, v.ts, isVersion = true, v.versionId,
        v.payload, -1L))
      .unionByName(probes.map(p =>
        TemporalIn(p.key, p.ts, isVersion = false, -1L, null, p.probeId)))
      .withWatermark("ts", delay)
    tagged.groupByKey(_.key)
      .transformWithState(new TemporalJoinProcessor,
        TimeMode.EventTime(), OutputMode.Append())
  }
}
