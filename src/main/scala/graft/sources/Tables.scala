package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Batch parquet table loaders for the driver-generated testdata
  * (TESTDATA.md). Each accessor is a plain `spark.read.parquet` so
  * Catalyst keeps full pushdown/pruning freedom — filters and column
  * selection applied by callers reach the parquet scan.
  *
  * At 100 TB these would be partitioned/bucketed catalog tables
  * (e.g. orders/lineitem bucketed by orderkey so the orderkey join is
  * shuffle-free); the accessors stay the same shape.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 rejects
    * unless read as a raw long (`nanosAsLong`). Normalize to epoch
    * microseconds (`ts_us` BIGINT, truncating like DuckDB's ns->us read)
    * so downstream time arithmetic is exact integer math. */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t("events").withColumn("ts_us", org.apache.spark.sql.functions.expr("ts div 1000"))
      .drop("ts")
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
