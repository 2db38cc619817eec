package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dynamic rules against a running stream — the Spark-first twin of
  * Flink's broadcast-state pattern (a low-volume rules stream
  * broadcast into a keyed operator so thresholds change WITHOUT
  * restarting the job; the reference's fraud detector hardcodes its
  * thresholds — FraudDetectorExample.java — and this is how a user
  * outgrows that).
  *
  * Spark idiom: rules are not a second stream but a tiny COMMITTED
  * TABLE ([[graft.core.IndexStore]] marker protocol — a maintainer
  * publishes a new rule set atomically with `replace`), re-resolved
  * at every trigger and broadcast-joined against the micro-batch.
  * Per-trigger cost is one metadata probe + a kilobyte-scale read +
  * a broadcast of the rules — nothing keyed by stream volume, which
  * is what makes this the scale-correct encoding of "broadcast
  * state": the rules reach every task of every batch, but live in
  * no per-key state store and survive no checkpoint (the TABLE is
  * the source of truth; a restarted query picks up the current
  * rules exactly like a running one does at its next trigger).
  *
  * The explicit `refreshByPath` matters when the maintainer is a
  * DIFFERENT JVM: this session's file-listing cache still describes
  * the old artifact after an external swap (the StreamAnn
  * quantizer-generation lesson), and without the refresh the stream
  * would keep flagging against retired rules indefinitely.
  */
object StreamRules {

  /** The current committed rule set. A maintainer's `replace` has a
    * brief uncommitted window (old dir renamed aside, new not yet
    * marked); a trigger landing inside it must WAIT, not kill the
    * stream — a loud fail here terminates the whole query and stops
    * alerting until a manual restart, the opposite of the module's
    * no-restart contract. The RETRY wraps the read itself, not a
    * pre-poll: an isCommitted probe that succeeds and then a read — the
    * first cut here — leaves a TOCTOU window where a swap landing
    * between the two still killed the query, the exact failure the
    * grace exists to absorb. Bounded by the same session conf as
    * IndexStore's publish grace; loud only if no committed rule set
    * appears within it (genuinely missing ≠ mid-swap). */
  def currentRules(spark: SparkSession, rulesPath: String): DataFrame = {
    val graceMs = spark.conf
      .get("spark.graft.index.publishGraceMs", "2000").toLong
    val deadline = System.currentTimeMillis() + graceMs
    while (true) {
      spark.catalog.refreshByPath(rulesPath)
      try {
        return graft.core.IndexStore.read(spark, rulesPath, "rule set",
          "IndexStore.replace (see StreamRules)")
      } catch {
        // BOTH mid-swap faces: the require inside IndexStore.read
        // (marker missing -> IllegalArgumentException) AND the parquet
        // load itself (replace renames the target ASIDE before the
        // scratch renames in, so a read landing in that gap throws
        // PATH_NOT_FOUND as an AnalysisException). Re-poll either until
        // the deadline, then propagate the loud failure as-is.
        case e @ (_: IllegalArgumentException |
                  _: org.apache.spark.sql.AnalysisException) =>
          if (System.currentTimeMillis() >= deadline) throw e
          Thread.sleep(50)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Flag the rows of `batch` that meet or exceed their key's
    * threshold. `rules` must carry `keyCol` and `min_value`; rows
    * with no rule for their key pass through unflagged (inner join —
    * absent rule, no alert). */
  def flag(batch: DataFrame, rules: DataFrame,
           keyCol: String = "event_type",
           valueCol: String = "value"): DataFrame =
    batch.join(broadcast(rules), Seq(keyCol))
      .filter(col(valueCol) >= col("min_value"))
      .drop("min_value")

  /** The `foreachBatch` function: re-resolve rules, flag, hand the
    * alerts to `sink` (e.g. [[StreamSink.parquetAppender]] or a
    * collector in specs). */
  def alertApplier(rulesPath: String,
                   sink: (DataFrame, Long) => Unit): (DataFrame, Long) => Unit =
    (df, id) => sink(flag(df, currentRules(df.sparkSession, rulesPath)), id)
}
