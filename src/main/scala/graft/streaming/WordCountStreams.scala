package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.TextOps

/** Streaming word-count topologies (ref WindowWordCount /
  * AdvancedWordCount): tokenize a `value: string` stream and maintain a
  * rolling per-word count.
  *
  * Emission cadence: Flink's `keyBy().sum()` emits an updated count per
  * input record; Spark's update output mode emits one updated row per
  * key per micro-batch — same final counts, micro-batched cadence
  * (SURVEY.md §4). Run the returned frame with
  * `.writeStream.outputMode("update")`.
  */
object WordCountStreams {

  /** WindowWordCount.java:14-28 — split on single spaces, rolling count. */
  def rollingWordCount(lines: DataFrame): DataFrame =
    lines.select(explode(split(col("value"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))

  /** AdvancedWordCount.java:21-45 — normalize, tokenize on \s+, drop
    * stopwords, rolling count. */
  def advancedWordCount(lines: DataFrame): DataFrame =
    lines.select(TextOps.normalize(col("value")).as("norm"))
      .select(explode(split(col("norm"), "\\s+")).as("word"))
      .filter(length(col("word")) > 0 && TextOps.dropStopwords(col("word")))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))
}
