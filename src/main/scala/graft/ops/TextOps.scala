package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stateless text transforms — the Spark-native forms of the reference's
  * map/flatMap/filter lambdas (SURVEY.md §2.3).
  *
  * All of these are built-in Catalyst expressions (codegen'd, pushdown-
  * friendly); none need UDFs. At 100 TB this matters: a Scala closure in
  * the hot path would break whole-stage codegen and column pruning.
  */
object TextOps {

  /** Reference stopword set (AdvancedWordCount.java:26-28). Small enough
    * to inline into an `isin` predicate — at scale this compiles to a
    * hash-set probe per row, no join needed. A large stopword table would
    * become a broadcast left-anti join instead. */
  val stopWords: Seq[String] =
    Seq("a", "the", "is", "in", "at", "of", "on", "and", "or", "to", "with")

  /** Lowercase + strip non-letter/non-space chars
    * (ref: AdvancedWordCount.java:32). */
  def normalize(c: Column): Column =
    regexp_replace(lower(c), "[^a-z\\s]", "")

  /** 1→N tokenize on whitespace, dropping empty tokens
    * (ref: WindowWordCount.java:30-37, AdvancedWordCount.java:52-61).
    * `explode` is a Catalyst Generator — the Spark-native flatMap. */
  def explodeTokens(df: DataFrame, c: Column, out: String): DataFrame =
    df.select(explode(split(c, "\\s+")).as(out))
      .filter(length(col(out)) > 0)

  /** Stopword drop (ref: AdvancedWordCount.java:36). */
  def dropStopwords(c: Column): Column = !c.isin(stopWords: _*)

  /** Parse a "ts,word"-style CSV line into typed columns
    * (ref: EventTimeWordCountDebug.java:37-42). */
  def csvField(line: Column, idx: Int): Column =
    trim(element_at(split(line, ","), idx))
}
