package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.agg.Aggregates
import Oracle._

/** Batch analogs of the reference's keyed-aggregation and event-time
  * operators over the `events` table (SURVEY.md §2.4 A2-A4, §2.5 W2/W4/W5).
  * The streaming forms live in graft.streaming; these give the same
  * semantics a DuckDB oracle can check.
  */
object EventQueries extends QueryGroup {

  private val S = 1000000L // µs per second

  /** A2 — rolling per-key running sum/count, one output per input record
    * (WindowWordCount's keyBy().sum() emission pattern, batch form). */
  def rollingSum(spark: SparkSession, dir: String): DataFrame = {
    val w = Aggregates.runningWindow(col("user_id"), col("ts_us"), col("event_id"))
    // int64-snapped accumulation (see ext/Similarity.scala): exact,
    // engine-identical, and ~2x faster than a decimal window aggregate.
    val snapped = floor(col("value") * lit(1000000.0) + lit(0.5)).cast("long")
    Tables(spark, dir).events.select(
        col("user_id"), col("event_id"), col("ts_us"),
        (sum(snapped).over(w).cast("double") / lit(1000000.0)).as("running_value"),
        count(lit(1)).over(w).as("running_cnt"))
    // no final orderBy: the gate's compare is order-insensitive, and a
    // global sort of the full O(n) output costs 4x the window itself
  }

  /** A3 — tumbling 10 s event-time window count+sum per event_type. */
  def tumblingCounts(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events
      .select(Aggregates.tumbleStartUs(col("ts_us"), 10 * S).as("w_start_us"),
              col("event_type"), col("value"))
      .groupBy(col("w_start_us"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"))

  /** A4 — sliding 10 s / 5 s window count per event_type. Each row maps
    * to exactly 2 windows (size/slide), via an exploded projection. */
  def slidingCounts(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events
      .select(Aggregates.slideStartsUs(col("ts_us"), 10 * S, 5 * S).as("w_start_us"),
              col("event_type"))
      .groupBy(col("w_start_us"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))

  /** W2+W4+W5 — late-data audit. Watermark = running max event time over
    * arrival order (event_id) minus 5 s disorder bound; a record is LATE
    * if it arrives below watermark - 5 s allowed lateness
    * (EventTimeWordCountDebug's side-output split, batch form).
    *
    * The global prefix-max is computed scale-safe: arrival order is cut
    * into fixed chunks, the prefix-max inside each chunk is a window
    * PARTITIONED by chunk (parallel, no single-partition WindowExec over
    * the events), and each chunk's carry-in — the max over all earlier
    * chunks — is an EXCLUSIVE running max over the per-chunk maxima,
    * itself a window over the chunk-level frame (one row per chunk;
    * at 10^12 rows and 2^20-row chunks that is ~10^6 rows in one small
    * executor-side partition — never a driver collect), broadcast-joined
    * back. greatest(intra, carry) restores the exact global prefix-max.
    * The streaming form (EventTimeOps.LateSplitter) tracks the watermark
    * per micro-batch instead.
    *
    * `chunkSize` bounds the chunk-level frame at n/chunkSize rows: the
    * production default 2^20 leaves ~10^6 rows at 10^12 events. The
    * result is chunk-size-invariant (spec-asserted) — the registered
    * sf-scale query passes 2^10 explicitly so oracle runs still span
    * many chunks. */
  def lateDataAudit(spark: SparkSession, dir: String,
                    chunkSize: Long = 1L << 20): DataFrame = {
    require(chunkSize > 0, s"chunkSize must be positive, got $chunkSize")
    val ev = Tables(spark, dir).events
      .select(col("event_id"), col("ts_us"),
        expr(s"event_id div $chunkSize").cast("long").as("chunk"))
    val wIntra = Window.partitionBy(col("chunk")).orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // carry-in per chunk: running max of chunk maxima, EXCLUSIVE (null
    // for the first chunk — no earlier chunk exists). The global-order
    // window runs single-partition by construction, but over the
    // chunk-level frame only — bounded by chunkSize, executor-side.
    val wCarry = Window.orderBy(col("chunk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carryDf = ev.groupBy(col("chunk"))
      .agg(max(col("ts_us")).cast("long").as("m"))
      .select(col("chunk"), max(col("m")).over(wCarry).as("carry_max"))
    ev.join(broadcast(carryDf), Seq("chunk"), "left")
      .select(col("event_id"), col("ts_us"),
        (greatest(max(col("ts_us")).over(wIntra), col("carry_max")) - 5 * S)
          .as("watermark_us"))
      .select(col("event_id"), col("ts_us"), col("watermark_us"),
        when(col("watermark_us").isNotNull &&
             col("ts_us") < col("watermark_us") - 5 * S, lit("LATE"))
          .otherwise(lit("OK")).as("status"))
  }

  /** Session windows (gap 30 min) per user — beyond the reference's
    * assigners (SURVEY.md §2.8); Spark has session_window built in, the
    * batch-deterministic analog here is gaps-and-islands: a new session
    * starts when the gap from the previous event exceeds the timeout.
    * One shuffle on user_id + in-partition sort — scales like any
    * windowed fold. */
  def sessionWindows(spark: SparkSession, dir: String): DataFrame = {
    val gapUs = 30L * 60 * S
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val run = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(spark, dir).events
      .select(col("user_id"), col("event_id"), col("ts_us"),
        when(col("ts_us") - lag(col("ts_us"), 1).over(byUser) > gapUs ||
             lag(col("ts_us"), 1).over(byUser).isNull, 1L).otherwise(0L).as("new_sess"))
      .withColumn("session_id", sum(col("new_sess")).over(run))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts_us")).as("sess_start_us"), max(col("ts_us")).as("sess_end_us"),
        count(lit(1)).as("n_events"))
  }

  /** As-of join (beyond the reference — the classic temporal operator
    * Spark lacks as a built-in): each event gets the user's most recent
    * order date at-or-before the event time. Implemented with the
    * union-sort-window composition (ops/AsOf.scala); the oracle uses
    * DuckDB's native ASOF JOIN. */
  def asofLastOrder(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
      .select(col("user_id"), col("event_id"), col("ts_us"))
    val ord = Tables(spark, dir).orders
      .select(col("o_custkey").as("user_id"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("o_date_us"))
    graft.ops.AsOf.lastRightTs(ev, ord, "user_id", "ts_us", "o_date_us",
        "last_order_date_us", Seq("event_id", "ts_us"))
      .select(col("event_id"), col("user_id"), col("ts_us"), col("last_order_date_us"))
  }

  /** Interval (range) join, binned — purchase attribution: for each
    * purchase, count the same user's click/view events in the preceding
    * 24 hours. A naive range join is a nested-loop scan (no equi-key);
    * the scale-safe form adds one: bucket time into window-sized bins,
    * explode each purchase's (p_ts - 24h, p_ts] lookback into the
    * (exactly two) bins it can overlap, equi-join on (user, bin), and
    * apply the exact range predicate AFTER the hash join. The shuffle is
    * keyed by (user, bin) so bucket sizes track per-user daily activity
    * — no pair explosion, no broadcast of a fact table. */
  def intervalJoin(spark: SparkSession, dir: String): DataFrame = {
    val W = 86400L * 1000000L // 24 h in µs
    val ev = Tables(spark, dir).events
      .select(col("user_id"), col("event_id"), col("ts_us"), col("event_type"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("p_event"),
        col("ts_us").as("p_ts"))
      .withColumn("bin",
        explode(array(expr(s"p_ts div $W"), expr(s"p_ts div $W - 1"))))
    val prior = ev.filter(col("event_type").isin("click", "view"))
      .withColumn("bin", expr(s"ts_us div $W"))
    prior.join(purchases,
        col("user_id") === col("p_user") &&
        prior("bin") === purchases("bin") &&
        col("ts_us") > col("p_ts") - W &&
        col("ts_us") <= col("p_ts"))
      .groupBy(col("p_event"), col("p_user"))
      .agg(count(lit(1)).as("n_prior"), max(col("ts_us")).as("last_prior_us"))
  }

  /** Lead/lag window functions: per-user inter-event gap and the next
    * event's type — the sequence-analysis staples. One partitioned
    * window (user), fully parallel across users. */
  def leadLag(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    Tables(spark, dir).events
      .select(col("user_id"), col("event_id"), col("ts_us"),
        (col("ts_us") - lag(col("ts_us"), 1).over(w)).as("gap_us"),
        lead(col("event_type"), 1).over(w).as("next_type"))
  }

  /** Pivot: per-user event-type counts as columns. Spark's `pivot` with
    * explicit values compiles to conditional aggregation — one shuffle,
    * no second pass to discover the column set (the explicit value list
    * is what makes pivot scale-safe). */
  def pivotEventCounts(spark: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    Tables(spark, dir).events
      .groupBy(col("user_id"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .na.fill(0L, types)
      .orderBy(col("user_id"))
  }

  /** Approximate distinct (HLL++). Sketch estimates differ per engine,
    * so the hash-checked columns are the exact count plus a boolean
    * asserting the sketch landed within its ±5% guarantee — the estimate
    * itself stays out of the hash (the oracle emits TRUE there). The
    * numeric error bound is additionally unit-asserted in
    * QueriesSmokeSpec. */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
           countDistinct(col("user_id")).as("exact_users"))
      .select(col("event_type"), col("exact_users"),
        (abs(col("approx_users") - col("exact_users")).cast("double") /
          col("exact_users") <= 0.05).as("approx_within_5pct"))
      .orderBy(col("event_type"))

  /** Funnel analysis: each user's furthest strictly-ordered progress
    * through view → click → purchase. The correlated "first click
    * AFTER the first view" chain would be three shuffle-join passes in
    * the naive plan; here it is ONE shuffle (the per-user
    * `collect_list`) followed by pure array projections in a single
    * codegen span — each stage timestamp is an `array_min` over a
    * lambda-filtered view of the event array, with the previous
    * stage's column as an outer reference in the filter (no sort
    * needed: min is order-free). Strict `>` between stages makes the
    * result tie-deterministic and engine-identical; the DuckDB oracle
    * derives the same stages through the explicit three-pass
    * conditional-min joins, so the single-pass rewrite is
    * cross-checked against the textbook plan.
    *
    * Scale: per-user state is that user's events — production funnels
    * scope a time window (date filter on the scan, or the streaming
    * twin's watermark), which bounds the array; a corpus whose
    * per-user history outgrows memory falls back to exactly the
    * oracle's 3-pass join plan, trading two more shuffles for O(1)
    * row width. */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    // native single-loop stage primitive (FirstEventAfter scaladoc:
    // the HOF chain filter→transform→array_min interprets its lambdas
    // per element and allocates two arrays per stage per row); the
    // first stage's "after" is -infinity, later stages chain the
    // previous stage column — null propagation IS the funnel contract
    def firstAt(ev: String, after: Option[Column]): Column =
      graft.functions.FirstEventAfter.first_event_after(
        col("__evs"), lit(ev), after.getOrElse(lit(Long.MinValue)))
    Tables(spark, dir).events
      .groupBy(col("user_id"))
      .agg(collect_list(struct(col("ts_us").as("ts"),
        col("event_type").as("t"))).as("__evs"))
      .withColumn("s1_us", firstAt("view", None))
      .withColumn("s2_us", firstAt("click", Some(col("s1_us"))))
      .withColumn("s3_us", firstAt("purchase", Some(col("s2_us"))))
      .withColumn("stage",
        when(col("s3_us").isNotNull, 3L)
          .when(col("s2_us").isNotNull, 2L)
          .when(col("s1_us").isNotNull, 1L)
          .otherwise(0L))
      .select(col("user_id"), col("s1_us"), col("s2_us"), col("s3_us"),
        col("stage"))
      .orderBy(col("user_id"))
  }

  /** The funnel's BOUNDED operating mode — what a11 deploys as when the
    * per-user history cannot be collected into a row: a bot with 10M
    * events makes `collect_list` row width unbounded, and no cap that
    * truncates the array can stay exact. This form never materializes a
    * history: it is the 3-pass conditional-min join the a11 scaladoc
    * promises (and the oracle always used) with a time-window scan
    * filter in front — each stage is a hash aggregation carrying ONE
    * long of state per user, each join is user-keyed, so per-task
    * memory is O(users-per-partition), independent of how skewed one
    * user's event count is. Two more shuffles than the collect_list
    * form, O(1) row width — the d12_slice precedent of registering the
    * scale posture beside the compact one. The window filter is on the
    * derived epoch-us column (uniform across both testdata timestamp
    * generations); a production table with native TIMESTAMP(MICROS)
    * would filter the raw column and get row-group pruning too. */
  def funnelBounded(spark: SparkSession, dir: String): DataFrame = {
    // [2024-01-08, 2024-01-22): a two-week analysis window mid-corpus
    val winStartUs = 1704672000000000L
    val winEndUs   = 1705881600000000L
    val ev = Tables(spark, dir).events
      .filter(col("ts_us") >= winStartUs && col("ts_us") < winEndUs)
      .select(col("user_id"), col("event_type"), col("ts_us"))
    val s1 = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id").as("__u1")).agg(min(col("ts_us")).as("s1_us"))
    val s2 = ev.filter(col("event_type") === "click")
      .join(s1, col("user_id") === col("__u1"))
      .filter(col("ts_us") > col("s1_us"))
      .groupBy(col("user_id").as("__u2")).agg(min(col("ts_us")).as("s2_us"))
    val s3 = ev.filter(col("event_type") === "purchase")
      .join(s2, col("user_id") === col("__u2"))
      .filter(col("ts_us") > col("s2_us"))
      .groupBy(col("user_id").as("__u3")).agg(min(col("ts_us")).as("s3_us"))
    ev.select(col("user_id")).distinct()
      .join(s1, col("user_id") === col("__u1"), "left")
      .join(s2, col("user_id") === col("__u2"), "left")
      .join(s3, col("user_id") === col("__u3"), "left")
      .withColumn("stage",
        when(col("s3_us").isNotNull, 3L)
          .when(col("s2_us").isNotNull, 2L)
          .when(col("s1_us").isNotNull, 1L)
          .otherwise(0L))
      .select(col("user_id"), col("s1_us"), col("s2_us"), col("s3_us"),
        col("stage"))
      .orderBy(col("user_id"))
  }

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a11_funnel" -> (funnel _),
    "a11_funnel_bounded" -> (funnelBounded _),
    "a7_pivot_event_counts" -> (pivotEventCounts _),
    "a8_approx_distinct" -> (approxDistinct _),
    "a6_asof_last_order" -> (asofLastOrder _),
    "a2_rolling_sum"     -> (rollingSum _),
    "a3_tumbling_counts" -> (tumblingCounts _),
    "a4_sliding_counts"  -> (slidingCounts _),
    "a5_session_windows" -> (sessionWindows _),
    "a9_interval_join"   -> (intervalJoin _),
    "a10_lead_lag"       -> (leadLag _),
    "w5_late_data_audit" ->
      ((s: SparkSession, d: String) => lateDataAudit(s, d, chunkSize = 1L << 10))
  )

  def oracles: Map[String, String] = Map(
    "a11_funnel" ->
      """WITH s1 AS (
        |  SELECT user_id, min(epoch_us(ts)) AS s1_us
        |  FROM events WHERE event_type = 'view' GROUP BY user_id
        |), s2 AS (
        |  SELECT e.user_id, min(epoch_us(e.ts)) AS s2_us
        |  FROM events e JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'click' AND epoch_us(e.ts) > s1_us
        |  GROUP BY e.user_id
        |), s3 AS (
        |  SELECT e.user_id, min(epoch_us(e.ts)) AS s3_us
        |  FROM events e JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s2_us
        |  GROUP BY e.user_id
        |), u AS (SELECT DISTINCT user_id FROM events)
        |SELECT u.user_id, s1_us, s2_us, s3_us,
        |  CAST(CASE WHEN s3_us IS NOT NULL THEN 3
        |            WHEN s2_us IS NOT NULL THEN 2
        |            WHEN s1_us IS NOT NULL THEN 1
        |            ELSE 0 END AS BIGINT) AS stage
        |FROM u
        |LEFT JOIN s1 ON u.user_id = s1.user_id
        |LEFT JOIN s2 ON u.user_id = s2.user_id
        |LEFT JOIN s3 ON u.user_id = s3.user_id
        |ORDER BY u.user_id""".stripMargin,
    "a11_funnel_bounded" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
        |  WHERE epoch_us(ts) >= 1704672000000000
        |    AND epoch_us(ts) < 1705881600000000
        |), s1 AS (
        |  SELECT user_id, min(ts_us) AS s1_us
        |  FROM ev WHERE event_type = 'view' GROUP BY user_id
        |), s2 AS (
        |  SELECT e.user_id, min(e.ts_us) AS s2_us
        |  FROM ev e JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'click' AND e.ts_us > s1_us
        |  GROUP BY e.user_id
        |), s3 AS (
        |  SELECT e.user_id, min(e.ts_us) AS s3_us
        |  FROM ev e JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts_us > s2_us
        |  GROUP BY e.user_id
        |), u AS (SELECT DISTINCT user_id FROM ev)
        |SELECT u.user_id, s1_us, s2_us, s3_us,
        |  CAST(CASE WHEN s3_us IS NOT NULL THEN 3
        |            WHEN s2_us IS NOT NULL THEN 2
        |            WHEN s1_us IS NOT NULL THEN 1
        |            ELSE 0 END AS BIGINT) AS stage
        |FROM u
        |LEFT JOIN s1 ON u.user_id = s1.user_id
        |LEFT JOIN s2 ON u.user_id = s2.user_id
        |LEFT JOIN s3 ON u.user_id = s3.user_id
        |ORDER BY u.user_id""".stripMargin,
    "a2_rolling_sum" ->
      """SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |  CAST(SUM(CAST(floor(value * 1000000 + 0.5) AS BIGINT))
        |    OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    / 1000000.0 AS running_value,
        |  COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_cnt
        |FROM events ORDER BY user_id, ts_us, event_id""".stripMargin,
    "a3_tumbling_counts" ->
      s"""SELECT epoch_us(ts) - (epoch_us(ts) % ${10 * S}) AS w_start_us, event_type,
         |  COUNT(*) AS cnt, ${sqlDsum("value")} AS sum_value
         |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "a4_sliding_counts" ->
      s"""SELECT epoch_us(ts) - (epoch_us(ts) % ${5 * S}) - k.off AS w_start_us, event_type,
         |  COUNT(*) AS cnt
         |FROM events CROSS JOIN (VALUES (0), (${5 * S})) AS k(off)
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "a7_pivot_event_counts" ->
      """SELECT user_id,
        |  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        |  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
        |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        |  CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        |  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "a9_interval_join" ->
      s"""SELECT p.event_id AS p_event, p.user_id AS p_user,
         |  CAST(COUNT(*) AS BIGINT) AS n_prior,
         |  MAX(epoch_us(e.ts)) AS last_prior_us
         |FROM events p JOIN events e
         |  ON p.event_type = 'purchase'
         | AND e.event_type IN ('click', 'view')
         | AND e.user_id = p.user_id
         | AND epoch_us(e.ts) >  epoch_us(p.ts) - ${86400L * 1000000L}
         | AND epoch_us(e.ts) <= epoch_us(p.ts)
         |GROUP BY 1, 2 ORDER BY p_event""".stripMargin,
    "a10_lead_lag" ->
      """SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |  epoch_us(ts) - lag(epoch_us(ts), 1)
        |    OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap_us,
        |  lead(event_type, 1)
        |    OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS next_type
        |FROM events ORDER BY user_id, ts_us, event_id""".stripMargin,
    "a6_asof_last_order" ->
      """SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
        |  epoch_us(o.o_orderdate) AS last_order_date_us
        |FROM events e
        |ASOF LEFT JOIN orders o
        |  ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
        |ORDER BY e.event_id""".stripMargin,
    "a5_session_windows" ->
      s"""WITH flagged AS (
         |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         |    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > ${30L * 60 * S}
         |           OR LAG(epoch_us(ts)) OVER w IS NULL
         |         THEN 1 ELSE 0 END AS new_sess
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
         |), sess AS (
         |  SELECT user_id, event_id, ts_us,
         |    CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
         |  FROM flagged
         |)
         |SELECT user_id, session_id, MIN(ts_us) AS sess_start_us,
         |  MAX(ts_us) AS sess_end_us, COUNT(*) AS n_events
         |FROM sess GROUP BY user_id, session_id
         |ORDER BY user_id, session_id""".stripMargin,
    "a8_approx_distinct" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS exact_users,
        |  TRUE AS approx_within_5pct
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "w5_late_data_audit" ->
      s"""SELECT event_id, ts_us, watermark_us,
         |  CASE WHEN watermark_us IS NOT NULL AND ts_us < watermark_us - ${5 * S}
         |       THEN 'LATE' ELSE 'OK' END AS status
         |FROM (
         |  SELECT event_id, epoch_us(ts) AS ts_us,
         |    MAX(epoch_us(ts)) OVER (ORDER BY event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) - ${5 * S} AS watermark_us
         |  FROM events
         |) ORDER BY event_id""".stripMargin
  )
}
