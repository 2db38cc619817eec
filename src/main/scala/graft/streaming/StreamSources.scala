package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Unbounded sources (SURVEY.md §2.1). Each yields a DataFrame with a
  * `value: string` column, mirroring the reference's raw-line streams.
  *
  * S2/S3 (bounded in-memory) have no wrapper here: batch code uses
  * `Seq(...).toDS()`, streaming tests use `MemoryStream[T]` directly.
  */
object StreamSources {

  /** S1 — line-delimited text over TCP
    * (ref socketTextStream, WindowWordCount.java:18). */
  def socketLines(spark: SparkSession, host: String, port: Int): DataFrame =
    spark.readStream.format("socket")
      .option("host", host).option("port", port).load()

  /** Bootstrap strings of the form `mock:<brokerDir>` select the
    * file-backed `graft-kafka` contract mock (the only broker available
    * in a no-network container); anything else is a real Kafka
    * bootstrap. Downstream topology is identical either way. */
  private def kafkaFormat(bootstrap: String): (String, Map[String, String]) =
    if (bootstrap.startsWith("mock:"))
      ("graft-kafka", Map(graft.sources.kafka.KafkaMock.BrokerDirKey ->
        bootstrap.stripPrefix("mock:")))
    else
      ("kafka", Map("kafka.bootstrap.servers" -> bootstrap))

  /** The COMPLETE (format, reader options) a [[kafkaRecords]] call
    * resolves to — the swap-in contract with the reference's source
    * builder (TradeChangeDetectionJob.java:30-37: setBootstrapServers /
    * setTopics / setGroupId / OffsetsInitializer.earliest), exposed so
    * `KafkaContractSpec` can pin the REAL-broker branch as an
    * option-map golden. The spark-sql-kafka jar cannot resolve in this
    * container (zero egress), so the one thing a test can verify about
    * that branch is that the options handed to
    * `readStream.format("kafka")` are exactly the documented mapping —
    * pinned by a spec instead of trusted to a comment. */
  private[graft] def kafkaPlan(bootstrap: String, topic: String,
      groupId: Option[String] = None): (String, Map[String, String]) = {
    val (fmt, opts) = kafkaFormat(bootstrap)
    val base = opts +
      ("subscribe" -> topic) +
      ("startingOffsets" -> "earliest")
    (fmt, groupId.fold(base)(g => base + ("kafka.group.id" -> g)))
  }

  /** S4 — Kafka topic values as UTF-8 strings from earliest offset
    * (ref KafkaSource builder, TradeChangeDetectionJob.java:31-41).
    * One Spark input partition per Kafka partition; offsets are tracked
    * in the checkpoint WAL. */
  def kafkaLines(spark: SparkSession, bootstrap: String, topic: String,
                 groupId: Option[String] = None): DataFrame =
    kafkaRecords(spark, bootstrap, topic, groupId).select("value")

  /** S4 variant keeping Kafka metadata: (value, partition, offset).
    * The offset is the per-partition arrival sequence — the ordering
    * basis for stateful folds downstream. */
  def kafkaRecords(spark: SparkSession, bootstrap: String, topic: String,
                   groupId: Option[String] = None): DataFrame = {
    val (fmt, opts) = kafkaPlan(bootstrap, topic, groupId)
    spark.readStream.format(fmt).options(opts)
      .load()
      .selectExpr("CAST(value AS STRING) AS value", "partition", "offset")
  }

  /** Deterministic local generator for smoke runs (no reference analog;
    * Spark's built-in rate source). */
  def rate(spark: SparkSession, rowsPerSecond: Int): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond.toString).load()
}
