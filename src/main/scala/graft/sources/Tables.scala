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

  /** Normalize `events.ts` to epoch microseconds (`ts_us` BIGINT) so
    * downstream time arithmetic is exact integer math regardless of the
    * physical type the generator wrote. The generator has shipped two
    * shapes so far: parquet TIMESTAMP(NANOS) (rejected by Spark 4 unless
    * read as a raw long via `nanosAsLong`, hence the conf + `div 1000`,
    * truncating like DuckDB's ns->us read) and TIMESTAMP(MICROS)
    * (surfacing as TIMESTAMP_NTZ; `unix_micros` after an NTZ->instant
    * cast is exact because every graft session pins the UTC timezone —
    * the same wall-clock-is-UTC reading DuckDB's `epoch_us(ts)` oracle
    * half uses). Branching on the observed type keeps both generations
    * of testdata readable. */
  def events: DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, unix_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t("events")
    val tsUs = raw.schema("ts").dataType match {
      case LongType         =>
        // the raw-long branch exists ONLY for the TIMESTAMP(NANOS)
        // generation read via nanosAsLong; if a future generator wrote
        // plain-BIGINT epoch MICROS, div 1000 would silently shift every
        // timestamp 1000x. Guard on magnitude: nanos-era epoch values
        // are >= 1e17 (mid-1973 in nanos), while any sane micros value
        // is < 1e17 (year ~5138) — one cheap min() over the column.
        val minTs = raw.selectExpr("min(ts)").head().getLong(0)
        require(minTs >= 100000000000000000L,
          s"events.ts is a raw BIGINT but min(ts)=$minTs is not in the " +
            "epoch-nanos range — generator schema drifted again; extend " +
            "Tables.events instead of silently dividing by 1000")
        expr("ts div 1000")
      case TimestampNTZType => unix_micros(col("ts").cast(TimestampType))
      case TimestampType    => unix_micros(col("ts"))
      case other => throw new IllegalStateException(
        s"unexpected events.ts type $other — extend Tables.events")
    }
    raw.withColumn("ts_us", tsUs).drop("ts")
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

object Tables {
  /** True iff `dir` carries the named table — fixture pre-builds use
    * this to skip quietly on PARTIAL scale replicas (a probe dir may
    * ship only documents+events); any query that truly needs the
    * table still fails loudly on its own read. Hadoop-FS addressed,
    * like the index stores. */
  def exists(spark: SparkSession, dir: String, name: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }
}
