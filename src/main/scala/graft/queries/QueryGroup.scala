package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named bundle of queries + their DuckDB oracle SQL. */
trait QueryGroup {
  def defs: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}
