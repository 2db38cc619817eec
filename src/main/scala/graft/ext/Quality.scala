package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraints over a table, verified in ONE
  * aggregation pass — the validation gate a training-data pipeline
  * runs before a corpus snapshot is allowed anywhere near a tokenizer
  * (the Deequ/expectations pattern, re-expressed Spark-first).
  *
  * Design rules, in scale order:
  *  - ONE job for the whole check set. Every constraint compiles to an
  *    aggregate expression over the same scan; N constraints never
  *    cost N passes. (Uniqueness constraints add Catalyst's
  *    multi-distinct Expand to that one pass — rows multiply by the
  *    distinct-column count +1, but the table is still read once.)
  *  - INTEGER verdict math. A constraint's threshold is per-mille
  *    (`minPerMille`), and pass = ok*1000 >= minPerMille*total in
  *    BIGINT arithmetic — no float ratio ever computed, so the same
  *    report hashes identically in any engine (a 0.95*total double
  *    threshold rounds differently across engines at some counts).
  *  - Row-level constraints double as STREAMING counters: the same
  *    ok-expressions ride `observe()` on a live stream, so a
  *    micro-batch's quality surfaces in StreamingQueryProgress with
  *    zero extra jobs ([[observed]]).
  *
  * The check vocabulary (all BIGINT ok-counts over non-null semantics
  * stated per check):
  *  - complete(c): rows where c IS NOT NULL
  *  - unique(c): distinct values of c (pass compares against total —
  *    a fully-unique column has ok == total; nulls are not counted,
  *    in both engines)
  *  - bounds(c, lo, hi): rows with c between lo and hi (nulls fail)
  *  - inSet(c, allowed): rows whose c is one of allowed (nulls fail)
  *  - matches(c, regex): rows whose c rlike regex (nulls fail; keep
  *    the regex in the POSIX-ish common core — Spark is java.util
  *    .regex, DuckDB is RE2, and exotic syntax diverges)
  *  - minLength(c, n): rows with length(c) >= n (nulls fail)
  *
  * Output schema (one row per check, deterministic order by
  * (check, col_name) for the oracle): check STRING, col_name STRING,
  * min_per_mille BIGINT, ok BIGINT, total BIGINT, pass BOOLEAN.
  */
object Quality {

  /** One declarative constraint: `okExpr` must be an aggregate Column
    * counting the rows (or distinct values) that satisfy it, and
    * `sql` its DuckDB-exact twin — carried together so the oracle can
    * never drift from the plan ([[profileSql]] assembles it). */
  final case class DqCheck(kind: String, column: String,
                           minPerMille: Int, okExpr: Column, sql: String,
                           rowLevel: Option[Column]) {
    require(minPerMille >= 0 && minPerMille <= 1000,
      s"minPerMille must be in [0,1000], got $minPerMille")
    // column names are interpolated unquoted into the DuckDB twin
    // ([[profileSql]]) — restrict them to plain identifiers so a quoted
    // or spaced name can never assemble broken / injected oracle SQL
    require(column.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"column must be a plain identifier, got '$column'")
  }

  def complete(c: String, minPerMille: Int = 1000): DqCheck =
    DqCheck("complete", c, minPerMille,
      count(col(c)),
      s"COUNT($c)",
      Some(col(c).isNotNull))

  def unique(c: String, minPerMille: Int = 1000): DqCheck =
    DqCheck("unique", c, minPerMille,
      countDistinct(col(c)),
      s"COUNT(DISTINCT $c)",
      None) // global property — no row-level form

  def bounds(c: String, lo: Long, hi: Long, minPerMille: Int = 1000): DqCheck =
    DqCheck("bounds", c, minPerMille,
      count(when(col(c).between(lo, hi), 1)),
      s"COUNT(*) FILTER ($c BETWEEN $lo AND $hi)",
      Some(col(c).between(lo, hi)))

  def inSet(c: String, allowed: Seq[String], minPerMille: Int = 1000): DqCheck = {
    val quoted = allowed.map(v => "'" + v.replace("'", "''") + "'")
    DqCheck("in_set", c, minPerMille,
      count(when(col(c).isin(allowed: _*), 1)),
      s"COUNT(*) FILTER ($c IN (${quoted.mkString(", ")}))",
      Some(col(c).isin(allowed: _*)))
  }

  def matches(c: String, regex: String, minPerMille: Int = 1000): DqCheck = {
    // same '' escaping as inSet: a regex containing a single quote must
    // not break (or redirect) the single-quoted DuckDB twin
    val esc = regex.replace("'", "''")
    DqCheck("matches", c, minPerMille,
      count(when(col(c).rlike(regex), 1)),
      s"COUNT(*) FILTER (regexp_matches($c, '$esc'))",
      Some(col(c).rlike(regex)))
  }

  def minLength(c: String, n: Int, minPerMille: Int = 1000): DqCheck =
    DqCheck("min_length", c, minPerMille,
      count(when(length(col(c)) >= n, 1)),
      s"COUNT(*) FILTER (LENGTH($c) >= $n)",
      Some(length(col(c)) >= n))

  /** Vector (embedding-column) checks — what a vector ingest gates on
    * before anything touches an index. Same (ok, total) shape, same
    * one-pass compilation. */

  /** Every row's array has exactly `d` components (null arrays fail). */
  def vecDims(c: String, d: Int, minPerMille: Int = 1000): DqCheck =
    DqCheck("vec_dims", c, minPerMille,
      count(when(size(col(c)) === d, 1)),
      s"COUNT(*) FILTER (len($c) = $d)",
      Some(size(col(c)) === d))

  /** No NaN and no null component (null arrays fail — exists() over a
    * null array is null on both engines and counts out). */
  def vecFinite(c: String, minPerMille: Int = 1000): DqCheck =
    DqCheck("vec_finite", c, minPerMille,
      count(when(!exists(col(c), x => isnan(x) || x.isNull), 1)),
      s"COUNT(*) FILTER (len(list_filter($c, x -> isnan(x) OR x IS NULL)) = 0)",
      Some(!exists(col(c), x => isnan(x) || x.isNull)))

  /** Squared norm within [loQ, hiQ] in QUANTIZED units — the snapped
    * int64 convention the whole similarity tier runs on (component ×
    * 1e6, so a unit vector's normSq is ~1e12): exact integer math on
    * both engines, no float-sum ordering anywhere.
    *
    * Null/NaN-SAFE: a null array, null component, or NaN component
    * FAILS the check rather than crashing the one-pass job.
    * `Similarity.snapVec` (SnapVecLong) throws on a null component and
    * floor(NaN).toLong silently yields 0, so the norm expression is
    * only reached behind a finiteness guard — CaseWhen branches are
    * lazily evaluated (codegen and interpreted), so the guard actually
    * protects. The DuckDB twin needs the same guard for different
    * failure modes: list_aggregate 'sum' silently SKIPS null components
    * (divergent verdict) and a NaN errors the BIGINT cast — the twin
    * uses the same CASE guard plus TRY_CAST so it cannot error even if
    * the engine evaluated the THEN arm eagerly. */
  def vecNormQ(c: String, loQ: Long, hiQ: Long,
               minPerMille: Int = 1000): DqCheck = {
    val sv = Similarity.snapVec(col(c))
    val normSq = Similarity.dotLong(sv, sv)
    val clean = !exists(col(c), x => x.isNull || isnan(x))
    val ok = when(clean, normSq.between(loQ, hiQ)).otherwise(false)
    val snapSql = "TRY_CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)"
    val guardSql = s"len(list_filter($c, x -> x IS NULL OR isnan(x))) = 0"
    DqCheck("vec_norm", c, minPerMille,
      count(when(ok, 1)),
      s"COUNT(*) FILTER (CASE WHEN $guardSql THEN " +
        s"list_aggregate(list_transform($c, " +
        s"x -> $snapSql * $snapSql), 'sum') BETWEEN $loQ AND $hiQ " +
        s"ELSE false END)",
      Some(ok))
  }

  /** The quality report: one aggregation pass over `df`, one output
    * row per check. Sorted by (check, col_name) so the report is a
    * deterministic, oracle-hashable table (presentation sort over
    * |checks| rows — nothing corpus-sized is ever ordered). */
  def profile(df: DataFrame, checks: Seq[DqCheck]): DataFrame =
    profileBy(df, Seq.empty, checks)

  /** The GROUPED report — per-source/per-shard data health, the shape
    * a 100 TB ingest actually tracks (one global pass says "the corpus
    * is 96% complete"; the grouped pass says WHICH source is shipping
    * the nulls). Still one aggregation job: the same ok-expressions
    * under a groupBy, so cost is the global profile's plus one keyed
    * exchange of |groups| × |checks|-wide partial rows. Output adds the
    * group columns in front; each group's verdicts use ITS total. */
  def profileBy(df: DataFrame, groupCols: Seq[String],
                checks: Seq[DqCheck]): DataFrame = {
    require(checks.nonEmpty, "empty check set")
    val aggs = count(lit(1)).cast("long").as("__total") +:
      checks.zipWithIndex.map { case (c, i) =>
        c.okExpr.cast("long").as(s"__ok$i") }
    val row =
      if (groupCols.isEmpty) df.agg(aggs.head, aggs.tail: _*)
      else df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val mpm = element_at(typedlit(checks.map(_.minPerMille.toLong)),
      col("__pos") + 1)
    row.select(groupCols.map(col) ++ Seq(
        posexplode(array(checks.indices.map(i => col(s"__ok$i")): _*))
          .as(Seq("__pos", "ok")),
        col("__total").as("total")): _*)
      .select(groupCols.map(col) ++ Seq(
        element_at(typedlit(checks.map(_.kind)), col("__pos") + 1)
          .as("check"),
        element_at(typedlit(checks.map(_.column)), col("__pos") + 1)
          .as("col_name"),
        mpm.as("min_per_mille"),
        col("ok"), col("total"),
        (col("ok") * 1000 >= mpm * col("total")).as("pass")): _*)
      .orderBy((groupCols :+ "check" :+ "col_name").map(col): _*)
  }

  /** The DuckDB twin of [[profile]] over table `table`, assembled from
    * the SAME check list so plan and oracle cannot drift. */
  def profileSql(table: String, checks: Seq[DqCheck]): String =
    profileBySql(table, Seq.empty, checks)

  /** The DuckDB twin of [[profileBy]]. */
  def profileBySql(table: String, groupCols: Seq[String],
                   checks: Seq[DqCheck]): String = {
    val okCols = checks.zipWithIndex
      .map { case (c, i) => s"${c.sql} AS ok$i" }.mkString(",\n    ")
    val gSel = groupCols.map(g => s"$g, ").mkString
    val gBy = if (groupCols.isEmpty) ""
              else groupCols.mkString("\n  GROUP BY ", ", ", "")
    // "check" must be quoted: it is a reserved word in DuckDB
    val rows = checks.zipWithIndex.map { case (c, i) =>
      s"""SELECT $gSel'${c.kind}' AS "check", '${c.column}' AS col_name, """ +
        s"CAST(${c.minPerMille} AS BIGINT) AS min_per_mille, " +
        s"CAST(ok$i AS BIGINT) AS ok, total, " +
        s"ok$i * 1000 >= ${c.minPerMille} * total AS pass FROM t"
    }.mkString("\nUNION ALL\n")
    s"""WITH t AS (
       |  SELECT ${gSel}CAST(COUNT(*) AS BIGINT) AS total,
       |    $okCols
       |  FROM $table$gBy
       |)
       |$rows
       |ORDER BY ${groupCols.map(_ + ", ").mkString}"check", col_name""".stripMargin
  }

  /** Row-level violations with reasons — the quarantine feed: every
    * row failing at least one row-level check (global checks like
    * `unique` have no row form and are skipped), with the failed
    * check kinds as a deterministic comma-joined string. A pure
    * projection + filter over the scan: no shuffle, no aggregation —
    * the shape that lets a 100 TB validation write its quarantine
    * split in the same pass that reads the corpus. */
  def violations(df: DataFrame, checks: Seq[DqCheck],
                 keyCols: Seq[String]): DataFrame = {
    val rowChecks = checks.flatMap(c => c.rowLevel.map(p => (c, p)))
    require(rowChecks.nonEmpty, "no row-level checks in the set")
    val reasons = array(rowChecks.map { case (c, p) =>
      when(!coalesce(p, lit(false)), s"${c.kind}(${c.column})")
    }: _*)
    df.select(keyCols.map(col) :+
        array_compact(reasons).as("__reasons"): _*)
      .filter(size(col("__reasons")) > 0)
      .withColumn("reasons", array_join(array_sort(col("__reasons")), ","))
      .drop("__reasons")
  }

  /** DRIFT between two quality reports — the monitoring read: has a
    * metric moved between the reference snapshot (last week's corpus,
    * the upstream table) and the current one by more than
    * `tolerancePerMille`? Joined on (check, col_name); each side's
    * ratio is reduced to integer per-mille FIRST (ok*1000/total —
    * BIGINT division, deterministic in any engine) and the delta
    * compared in that space. Deliberately NOT cross-multiplied
    * (|cur_ok*ref_total - ref_ok*cur_total|): exact, but overflows
    * i64 at ~1e12-row snapshots — per-mille granularity is what the
    * tolerance means anyway. FULL OUTER on the check key: a check
    * present in only one snapshot (a newly added constraint, a renamed
    * column) surfaces as a row with a null pm on the missing side and
    * `drifted = true` — a monitoring read must never silently drop the
    * very change it exists to catch. Output one row per check:
    * (check, col_name, cur_pm, ref_pm, drift_pm, drifted). */
  def drift(current: DataFrame, reference: DataFrame,
            tolerancePerMille: Int): DataFrame = {
    require(tolerancePerMille >= 0 && tolerancePerMille <= 1000,
      s"tolerancePerMille must be in [0,1000], got $tolerancePerMille")
    // div, not `/`: Column `/` is FLOAT division, and doubles lose
    // integer exactness past 2^53 — ok*1000 crosses that at ~9e12 rows
    def pm(side: DataFrame, name: String) = side.select(
      col("check"), col("col_name"),
      expr("ok * 1000 div total").as(name))
    // USING-column full outer coalesces the key columns, so one-sided
    // rows keep their (check, col_name); drift_pm stays null there and
    // `drifted` coalesces to true — appearance/disappearance IS drift
    pm(current, "cur_pm")
      .join(pm(reference, "ref_pm"), Seq("check", "col_name"), "full_outer")
      .withColumn("drift_pm", abs(col("cur_pm") - col("ref_pm")))
      .withColumn("drifted",
        coalesce(col("drift_pm") > tolerancePerMille, lit(true)))
      .orderBy(col("check"), col("col_name"))
  }

  /** The GATED WRITE — both splits in one pass: every row lands at
    * `path` under its row-level verdict (`dq=clean|quarantine`
    * partition dirs — STRING labels, not booleans: partition-value
    * inference reads booleans back as strings anyway, so the label is
    * the honest type and the readers' equality filters prune), so the
    * corpus is read ONCE and both the training split and the
    * quarantine split are materialized by the same job — at 100 TB
    * the alternative (filter twice) doubles the scan. Readers
    * partition-prune: [[readClean]]/[[readQuarantine]] touch only
    * their own dir (spec-pinned PartitionFilters). Global checks
    * (unique) are not row predicates and do not gate; run [[profile]]
    * on the clean split for those. */
  /** The row-level verdict — every row-level check holds, null-safe
    * (a null predicate fails). ONE definition, shared by the batch
    * gate ([[writeGated]]) and the streaming gate
    * ([[graft.streaming.StreamQuality.gatedApplier]]), whose splits a
    * spec pins row-for-row identical — two copies of this expression
    * would let a null-semantics tweak desynchronize them silently. */
  def passExpr(checks: Seq[DqCheck]): Column = {
    val rowChecks = checks.flatMap(_.rowLevel)
    require(rowChecks.nonEmpty, "no row-level checks to gate on")
    rowChecks.map(p => coalesce(p, lit(false))).reduce(_ && _)
  }

  def writeGated(df: DataFrame, checks: Seq[DqCheck], path: String): Unit =
    df.withColumn("dq",
        when(passExpr(checks), "clean").otherwise("quarantine"))
      .write.partitionBy("dq").mode("overwrite").parquet(path)

  def readClean(spark: org.apache.spark.sql.SparkSession,
                path: String): DataFrame =
    spark.read.parquet(path).filter(col("dq") === "clean").drop("dq")

  def readQuarantine(spark: org.apache.spark.sql.SparkSession,
                     path: String): DataFrame =
    spark.read.parquet(path).filter(col("dq") === "quarantine").drop("dq")

  /** The STREAMING face: the same row-level ok-counts as free
    * `observe()` counters on a live frame — per micro-batch via
    * `StreamingQueryProgress.observedMetrics(name)`, zero extra jobs.
    * Metric names are `ok_<kind>_<column>` plus `total`. NAME-based
    * observe, not an [[Observation]] handle: Observation refuses
    * streaming Datasets by design (one handle, many micro-batches) —
    * the progress event is the per-batch channel. Global checks
    * (unique) are skipped: observe() forbids distinct aggregates, and
    * a per-batch distinct is not the constraint anyway — run
    * [[profile]] on the materialized table for those. */
  def observed(df: DataFrame, checks: Seq[DqCheck],
               name: String = "dq"): DataFrame = {
    val rowChecks = checks.flatMap(c => c.rowLevel.map(p => (c, p)))
    require(rowChecks.nonEmpty, "no row-level checks to observe")
    val metrics = count(lit(1)).cast("long").as("total") +:
      rowChecks.map { case (c, p) =>
        count(when(p, 1)).cast("long").as(s"ok_${c.kind}_${c.column}") }
    df.observe(name, metrics.head, metrics.tail: _*)
  }
}
