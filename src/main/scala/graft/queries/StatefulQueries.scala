package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Batch analogs of the reference's keyed-state operators (SURVEY.md
  * §2.6 T1-T5) over the `events` table, each DuckDB-oracle-checked.
  * The per-record streaming forms (ValueState/ListState semantics,
  * alert throttling) live in graft.streaming with MemoryStream goldens —
  * these verify the same per-key logic in deterministic batch form.
  *
  * Scale notes: every query here shuffles once on user_id and sorts
  * within partitions; no global sort except the final presentation
  * ORDER BY (which exists only for oracle determinism).
  */
object StatefulQueries extends QueryGroup {

  private val S = 1000000L // µs per second
  private def byUser = Window.partitionBy(col("user_id"))
    .orderBy(col("ts_us"), col("event_id"))

  /** T1 — ValueState running click counter, 1 output per input
    * (UserClickCounter.java:39-61). */
  def clickCounter(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events
      .filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("ts_us"),
        row_number().over(byUser).cast("long").as("clicks"))
      .withColumn("message",
        concat(lit("user "), col("user_id"), lit(" has clicked "),
               col("clicks"), lit(" times.")))
    // full-output queries carry no final orderBy — the gate's compare is
    // order-insensitive and the global sort dwarfs the keyed window

  /** T2 — ListState accumulation; final per-key snapshot as ordered CSV
    * (UserEventListState.java:40-64). */
  def eventList(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events
      .groupBy(col("user_id"))
      .agg(
        concat_ws(",", transform(
          array_sort(collect_list(struct(col("ts_us"), col("event_id"), col("event_type")))),
          x => x.getField("event_type"))).as("events_csv"),
        count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))

  /** T3 — fraud pattern: >=3 high-value (>100) events within a sliding
    * lookback from the current event (FraudDetectorExample.java:71-121;
    * alert throttling is iterative state — covered by the streaming
    * golden spec, not SQL). The reference's 10-minute lookback is scaled
    * to 24 h here because the synthetic events are ~11 h apart per user —
    * 10 min would be vacuously empty. RANGE window on ts_us is
    * tie-insensitive, hence deterministic. */
  private val lookbackUs = 24L * 3600 * 1000000
  def fraudLookback(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
      .rangeBetween(-lookbackUs, 0)
    Tables(spark, dir).events
      .filter(col("value") > 100)
      .select(col("user_id"), col("event_id"), col("ts_us"),
        col("value").as("amount"),
        count(lit(1)).over(w).as("recent_cnt"))
      .filter(col("recent_cnt") >= 3)
      .orderBy(col("user_id"), col("ts_us"), col("event_id"))
  }

  /** T4 — per-key CDC: emit rows whose props changed vs the previous
    * record of the same key (TradeChangeDetectionJob.java:67-113). */
  def changeRows(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events
      .select(col("user_id"), col("event_id"), col("ts_us"), col("props"),
        lag(col("props"), 1).over(byUser).as("prev_props"))
      .filter(col("prev_props").isNotNull && col("prev_props") =!= col("props"))

  /** T5 — field-level JSON diff of consecutive per-key records
    * (TradeChangeDetectionJob.java:115-155), fully declarative: both
    * sides parse once with `from_json(Map<string,string>)` (Spark reads
    * any scalar as its JSON text, matching JsonNode.asText semantics),
    * the field set is the union of the two key arrays, and the
    * ADDED/MODIFIED/REMOVED classification is null-safe comparison on
    * `element_at` lookups — all codegen'd Catalyst expressions, no UDF.
    * The per-record streaming fold keeps graft.json.JsonDiff, where an
    * imperative diff against carried state is the right tool. */
  def jsonDiffRows(spark: SparkSession, dir: String): DataFrame = {
    val mapT = org.apache.spark.sql.types.MapType(
      org.apache.spark.sql.types.StringType,
      org.apache.spark.sql.types.StringType)
    Tables(spark, dir).events
      .select(col("user_id"), col("event_id"), col("ts_us"), col("props"),
        lag(col("props"), 1).over(byUser).as("prev_props"))
      .filter(col("prev_props").isNotNull)
      .select(col("user_id"), col("event_id"),
        from_json(col("prev_props"), mapT).as("pm"),
        from_json(col("props"), mapT).as("cm"))
      .select(col("user_id"), col("event_id"), col("pm"), col("cm"),
        explode(array_union(map_keys(col("pm")), map_keys(col("cm")))).as("field"))
      .select(col("user_id"), col("event_id"), col("field"),
        element_at(col("pm"), col("field")).as("old_value"),
        element_at(col("cm"), col("field")).as("new_value"))
      .filter(not(col("old_value") <=> col("new_value")))
      .select(col("user_id"), col("event_id"), col("field"),
        when(col("old_value").isNull, "ADDED")
          .when(col("new_value").isNull, "REMOVED")
          .otherwise("MODIFIED").as("action"),
        col("old_value"), col("new_value"))
  }

  /** Fixture memo: the upsert tables t6/t7/t8 read are deterministic
    * functions of the events table, so each is built ONCE per JVM per
    * sf dir and the registered queries time/verify only the READ — the
    * thing a 100 TB consumer pays per query. As timed in r10, the
    * registered forms re-ran init + appends (table-sized WRITES) on
    * every rep, so the bench rows priced the fixture, not the operator
    * (VERDICT r10 item 3; ProbeMor owns the isolated write/read costs).
    * [[prepareFixtures]] is the untimed entry Bench/Verify call before
    * the measured window; a cold call from inside a query is still
    * correct (the memo just builds on first touch). */
  private val fixtureMemo =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def memo(key: String)(build: => String): String =
    fixtureMemo.computeIfAbsent(key, _ => build)

  /** Build every upsert fixture this group's registered queries read —
    * called by Bench (untimed, after warmup) and Verify (before the
    * dump loop). Idempotent per (JVM, sf dir). */
  def prepareFixtures(spark: SparkSession, dir: String): Unit =
    // skip quietly on dirs without an events table (partial scale
    // replicas); a t6/t7/t8 call against such a dir fails loudly itself
    if (Tables.exists(spark, dir, "events")) {
      ensureApplied(spark, dir)
      ensureDelta(spark, dir, "upsert-tt")
      ensureDelta(spark, dir, "upsert-cf")
    }

  /** T6's fixture: seed an [[graft.ext.Upsert]] table from the first
    * half of the event stream (latest row per user), apply the second
    * half as a COW change batch ('error' events tombstone the user). */
  private def ensureApplied(spark: SparkSession, dir: String): String =
    memo(s"apply|$dir") {
      val ev = Tables(spark, dir).events
      // 1-row driver collect: the base/change split point, not data
      val half = ev.agg(max(col("event_id"))).head().getLong(0) / 2
      val cols = Seq("user_id", "event_id", "ts_us", "event_type", "value")
      val base = ev.filter(col("event_id") <= half).select(cols.map(col): _*)
      val changes = ev.filter(col("event_id") > half).select(cols.map(col): _*)
        .withColumn("op",
          when(col("event_type") === "error", "D").otherwise("U"))
      val path = graft.core.IndexStore.pathFor(spark, "upsert", dir)
      graft.ext.Upsert.init(base, path, "user_id", Seq("ts_us", "event_id"), 16)
      graft.ext.Upsert.applyChanges(spark, path, changes)
      path
    }

  /** T6 — the CDC MATERIALIZATION the reference's change-detection
    * job stops short of (TradeChangeDetectionJob.java emits changes;
    * applying them is the user's next step): read the merged table
    * back off [[ensureApplied]]'s fixture. The oracle is the
    * declarative equivalent — latest event per user over the WHOLE
    * stream, minus users whose latest event is a second-half error —
    * so hash equality here proves the bucket-selective merge machinery
    * (hash layout, per-bucket swap, delete semantics) reproduces the
    * one-shot answer. The registered form times the READ (a plain
    * committed-bucket scan, the COW fast path); the apply itself is
    * priced by tools/ProbeMor and ProbeUpsert. */
  def upsertApply(spark: SparkSession, dir: String): DataFrame = {
    val path = ensureApplied(spark, dir)
    graft.ext.Upsert.readTable(spark, path).orderBy(col("user_id"))
  }

  /** Shared T7/T8 fixture: the event stream split into base (first
    * half) + two MOR delta appends (third and fourth quarter, 'error'
    * events tombstoning), exercising the delta timeline the snapshot
    * and feed reads run over. Built once per (JVM, sf dir) via the
    * fixture memo; a rebuild is idempotent anyway (init resets the
    * table and clears committed deltas). */
  private def ensureDelta(spark: SparkSession, dir: String,
                          kind: String): String =
    memo(s"$kind|$dir") {
      val ev = Tables(spark, dir).events
      // 1-row driver collect: the split points, not data
      val maxId = ev.agg(max(col("event_id"))).head().getLong(0)
      val h1 = maxId / 2
      val h2 = 3 * maxId / 4
      val cols = Seq("user_id", "event_id", "ts_us", "event_type", "value")
      val base = ev.filter(col("event_id") <= h1).select(cols.map(col): _*)
      def chg(lo: Long, hi: Long) = ev
        .filter(col("event_id") > lo && col("event_id") <= hi)
        .select(cols.map(col): _*)
        .withColumn("op",
          when(col("event_type") === "error", "D").otherwise("U"))
      val path = graft.core.IndexStore.pathFor(spark, kind, dir)
      graft.ext.Upsert.init(base, path, "user_id", Seq("ts_us", "event_id"), 16)
      graft.ext.Upsert.appendChanges(spark, path, chg(h1, h2), deltaId = Some(0L))
      graft.ext.Upsert.appendChanges(spark, path, chg(h2, Long.MaxValue),
        deltaId = Some(1L))
      path
    }

  /** T7 — snapshot read off the merge-on-read delta timeline: the
    * table AS OF delta 0 (base + third quarter applied, final quarter
    * invisible). The oracle is the declarative equivalent — latest
    * event per user with event_id <= 3/4·max, minus users whose
    * latest is a second-delta-window error — so hash equality proves
    * the snapshot merge excludes exactly the post-asOf delta. Timed
    * as the READ alone (base + one delta merged per key), what a
    * snapshot consumer pays at any scale. */
  def upsertAsOf(spark: SparkSession, dir: String): DataFrame = {
    val path = ensureDelta(spark, dir, "upsert-tt")
    graft.ext.Upsert.readTableAsOf(spark, path, 0L).orderBy(col("user_id"))
  }

  /** T8 — the incremental-consumer read: net per-key change across
    * delta (0, 1] with the winning op attached, priced at the delta
    * dirs alone (the base never enters the plan — PLANS.md). */
  def upsertChangeFeed(spark: SparkSession, dir: String): DataFrame = {
    val path = ensureDelta(spark, dir, "upsert-cf")
    graft.ext.Upsert.changeFeed(spark, path, 0L, 1L).orderBy(col("user_id"))
  }

  /** T9 — temporal table join (Flink `FOR SYSTEM_TIME AS OF`, the
    * flagship enrichment the reference's stack is known for): each
    * probe event (final quarter of the stream) joins the versioned
    * per-user row VISIBLE AT ITS EVENT TIME — the latest history row
    * (base + both delta windows, t6/t7's timeline) with ts <= the
    * probe's ts, dropped when that version is a tombstone. One
    * shuffle of |probe|+|history| keyed rows via the union-sort-window
    * as-of form ([[graft.ops.AsOf.lastRightRow]]) — no range join, no
    * per-row probing, the a6 machinery generalized to carry the whole
    * winning row. */
  def temporalJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
    val maxId = ev.agg(max(col("event_id"))).head().getLong(0)
    val h1 = maxId / 2
    val h2 = 3 * maxId / 4
    val hist = ev.filter(col("event_id") <= h2)
      .select(col("user_id"), col("event_id"), col("ts_us"), col("value"),
        when(col("event_type") === "error" && col("event_id") > h1, "D")
          .otherwise("U").as("op"))
    val probe = ev.filter(col("event_id") > h2)
      .select(col("user_id"), col("event_id").as("p_event"),
        col("ts_us").as("p_ts"))
    graft.ops.AsOf.lastRightRow(probe, hist, "user_id", "p_ts", "ts_us",
        "event_id", "__v", Seq("p_event", "p_ts"),
        Seq("event_id", "value", "op"))
      .filter(col("__v").isNotNull && col("__v.op") =!= "D")
      .select(col("user_id"), col("p_event"), col("p_ts"),
        col("__v.event_id").as("h_event"), col("__v.value").as("h_value"))
      .orderBy(col("user_id"), col("p_event"))
  }

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t9_temporal_join"     -> (temporalJoin _),
    "t7_upsert_asof"       -> (upsertAsOf _),
    "t8_upsert_changefeed" -> (upsertChangeFeed _),
    "t6_upsert_apply"  -> (upsertApply _),
    "t1_click_counter" -> (clickCounter _),
    "t2_event_list"    -> (eventList _),
    "t3_fraud_lookback"-> (fraudLookback _),
    "t4_change_rows"   -> (changeRows _),
    "t5_json_diff"     -> (jsonDiffRows _)
  )

  def oracles: Map[String, String] = Map(
    "t9_temporal_join" ->
      """WITH hist AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, value,
        |    CASE WHEN event_type = 'error' AND
        |              event_id > (SELECT MAX(event_id) // 2 FROM events)
        |         THEN 'D' ELSE 'U' END AS op
        |  FROM events
        |  WHERE event_id <= (SELECT (3 * MAX(event_id)) // 4 FROM events)
        |), probe AS (
        |  SELECT user_id, event_id AS p_event, epoch_us(ts) AS p_ts
        |  FROM events
        |  WHERE event_id > (SELECT (3 * MAX(event_id)) // 4 FROM events)
        |), cand AS (
        |  SELECT p.user_id, p.p_event, p.p_ts,
        |         h.event_id AS h_event, h.value AS h_value, h.op,
        |         ROW_NUMBER() OVER (PARTITION BY p.user_id, p.p_event
        |           ORDER BY h.ts_us DESC, h.event_id DESC) AS rn
        |  FROM probe p JOIN hist h
        |    ON p.user_id = h.user_id AND h.ts_us <= p.p_ts
        |)
        |SELECT user_id, p_event, p_ts, h_event, h_value
        |FROM cand WHERE rn = 1 AND op <> 'D'
        |ORDER BY user_id, p_event""".stripMargin,
    "t7_upsert_asof" ->
      """SELECT user_id, event_id, ts_us, event_type, value FROM (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type, value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM events
        |  WHERE event_id <= (SELECT (3 * MAX(event_id)) // 4 FROM events)
        |) WHERE rn = 1
        |  AND NOT (event_type = 'error' AND
        |           event_id > (SELECT MAX(event_id) // 2 FROM events))
        |ORDER BY user_id""".stripMargin,
    "t8_upsert_changefeed" ->
      """SELECT user_id, event_id, ts_us, event_type, value,
        |  CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op
        |FROM (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type, value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM events
        |  WHERE event_id > (SELECT (3 * MAX(event_id)) // 4 FROM events)
        |) WHERE rn = 1
        |ORDER BY user_id""".stripMargin,
    "t6_upsert_apply" ->
      """SELECT user_id, event_id, ts_us, event_type, value FROM (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type, value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM events
        |) WHERE rn = 1
        |  AND NOT (event_type = 'error' AND
        |           event_id > (SELECT MAX(event_id) // 2 FROM events))
        |ORDER BY user_id""".stripMargin,
    "t1_click_counter" ->
      """SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS BIGINT) AS clicks,
        |  'user ' || user_id || ' has clicked ' ||
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) || ' times.' AS message
        |FROM events WHERE event_type = 'click'
        |ORDER BY user_id, ts_us, event_id""".stripMargin,
    "t2_event_list" ->
      """SELECT user_id,
        |  string_agg(event_type, ',' ORDER BY epoch_us(ts), event_id) AS events_csv,
        |  COUNT(*) AS n_events
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "t3_fraud_lookback" ->
      s"""SELECT user_id, event_id, epoch_us(ts) AS ts_us, value AS amount, recent_cnt
         |FROM (
         |  SELECT user_id, event_id, ts, value,
         |    COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
         |      RANGE BETWEEN $lookbackUs PRECEDING AND CURRENT ROW) AS recent_cnt
         |  FROM events WHERE value > 100
         |) WHERE recent_cnt >= 3
         |ORDER BY user_id, ts_us, event_id""".stripMargin,
    "t4_change_rows" ->
      """SELECT user_id, event_id, ts_us, props, prev_props FROM (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, props,
        |    LAG(props) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_props
        |  FROM events
        |) WHERE prev_props IS NOT NULL AND prev_props <> props
        |ORDER BY user_id, ts_us, event_id""".stripMargin,
    "t5_json_diff" ->
      """WITH valid AS (
        |  SELECT user_id, event_id, props, prev_props FROM (
        |    SELECT user_id, event_id, props,
        |      LAG(props) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_props
        |    FROM events
        |  ) WHERE prev_props IS NOT NULL
        |), fields AS (
        |  SELECT user_id, event_id, props, prev_props,
        |         unnest(json_keys(prev_props)) AS field FROM valid
        |  UNION
        |  SELECT user_id, event_id, props, prev_props,
        |         unnest(json_keys(props)) FROM valid
        |), diffs AS (
        |  SELECT user_id, event_id, field,
        |    json_extract_string(prev_props, '$.' || field) AS old_value,
        |    json_extract_string(props, '$.' || field) AS new_value
        |  FROM fields
        |)
        |SELECT user_id, event_id, field,
        |  CASE WHEN old_value IS NULL THEN 'ADDED'
        |       WHEN new_value IS NULL THEN 'REMOVED'
        |       ELSE 'MODIFIED' END AS action,
        |  old_value, new_value
        |FROM diffs
        |WHERE old_value IS DISTINCT FROM new_value
        |ORDER BY user_id, event_id, field""".stripMargin
  )
}
