package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.ops.TextOps

/** Oracle-checked batch forms of the reference's word-count pipelines
  * (SURVEY.md §2.3 P1-P7, §2.4 A1-A2 in batch form), run over the
  * `documents` / `events` tables.
  */
object TextQueries extends QueryGroup {

  private val stopList = TextOps.stopWords.map(w => s"'$w'").mkString(", ")

  // Full-output queries carry NO final orderBy: the correctness gate's
  // compare is row-order-insensitive, so a global sort of an O(n) output
  // is the most expensive no-op in the plan at scale. Small presentational
  // results (word counts, top-k) keep theirs.

  /** P1 — normalization map. */
  def normalizeDocs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .select(col("doc_id"), TextOps.normalize(col("text")).as("norm"))

  /** P2 + A1/A2 — tokenize + per-word count (WindowWordCount batch form).
    * Tokenize is a Generator (flatMap); the count is a partial-agg hash
    * aggregate: the shuffle carries one row per (partition, word), not
    * per token — this is what makes it hold at 100 TB. */
  def wordCount(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    TextOps.explodeTokens(docs, col("text"), "word")
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("word"))
  }

  /** P1+P3+P4+A2 — AdvancedWordCount batch form: normalize, tokenize,
    * stopword-drop, count. */
  def advancedWordCount(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    val norm = docs.select(TextOps.normalize(col("text")).as("norm"))
    TextOps.explodeTokens(norm, col("norm"), "word")
      .filter(TextOps.dropStopwords(col("word")))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("word"))
  }

  /** P5 — CSV parse roundtrip: build a "ts_us,event_type" line from
    * events, parse it back to typed columns (EventTimeWordCountDebug's
    * `"timestamp,word"` protocol). */
  def csvParse(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
    val lines = ev.select(
      col("event_id"),
      concat(col("ts_us"), lit(","), lit(" "), col("event_type")).as("line"))
    lines.select(
        col("event_id"),
        TextOps.csvField(col("line"), 1).cast("long").as("ts_us"),
        TextOps.csvField(col("line"), 2).as("word"))
  }

  /** P7 — JSON field extraction as grouping key
    * (TradeChangeDetectionJob.java:56-64). */
  def jsonKeyExtract(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))

  /** P7 through Spark 4's VARIANT type: parse once to the shredded
    * binary encoding, extract through `variant_get` — the path a
    * pipeline takes when it touches MORE than one field per document
    * (get_json_object re-parses the string per call; a variant parses
    * once and every extraction is an O(log fields) binary probe).
    * Same answer as p7 by construction — same oracle — so the pair
    * also pins that the variant path is semantics-identical, not just
    * faster at multi-key access (measured: BASELINE.md round 11). */
  def jsonKeyExtractVariant(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events
      .select(
        col("event_id"),
        variant_get(parse_json(col("props")), "$.k", "long").as("k"))

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p1_normalize"          -> (normalizeDocs _),
    "p2_wordcount"          -> (wordCount _),
    "p3_advanced_wordcount" -> (advancedWordCount _),
    "p5_csv_parse"          -> (csvParse _),
    "p7_json_key"           -> (jsonKeyExtract _),
    "p7_json_key_variant"   -> (jsonKeyExtractVariant _)
  )

  def oracles: Map[String, String] = Map(
    "p1_normalize" ->
      """SELECT doc_id, regexp_replace(lower(text), '[^a-z\s]', '', 'g') AS norm
        |FROM documents ORDER BY doc_id""".stripMargin,
    "p2_wordcount" ->
      """SELECT word, COUNT(*) AS cnt FROM (
        |  SELECT unnest(string_split_regex(text, '\s+')) AS word FROM documents
        |) WHERE strlen(word) > 0
        |GROUP BY word ORDER BY word""".stripMargin,
    "p3_advanced_wordcount" ->
      s"""SELECT word, COUNT(*) AS cnt FROM (
         |  SELECT unnest(string_split_regex(
         |    regexp_replace(lower(text), '[^a-z\\s]', '', 'g'), '\\s+')) AS word
         |  FROM documents
         |) WHERE strlen(word) > 0 AND word NOT IN ($stopList)
         |GROUP BY word ORDER BY word""".stripMargin,
    "p5_csv_parse" ->
      """SELECT event_id,
        |  CAST(trim(string_split(line, ',')[1]) AS BIGINT) AS ts_us,
        |  trim(string_split(line, ',')[2]) AS word
        |FROM (
        |  SELECT event_id, epoch_us(ts) || ', ' || event_type AS line FROM events
        |) ORDER BY event_id""".stripMargin,
    "p7_json_key" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin,
    // the variant twin answers identically by construction
    "p7_json_key_variant" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin
  )
}
