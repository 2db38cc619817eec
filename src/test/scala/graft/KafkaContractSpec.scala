package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.jobs.TradeChangeDetectionJob
import graft.sources.kafka.{FileBroker, KafkaMock}

/** S4/K3 integration over the file-backed Kafka contract mock: the
  * trade-CDC flagship (ref TradeChangeDetectionJob.java:26-53) runs
  * end-to-end — broker → source → keyed CDC → broker — plus the offset
  * semantics the real connector would provide (earliest/latest start,
  * checkpoint resume without replay, per-partition ordering).
  */
class KafkaContractSpec extends SparkTestBase {
  import spark.implicits._

  private def newBroker(): String =
    Files.createTempDirectory("graft-broker").toString

  // the reference scenario: trade updates as Kafka JSON values, keyed
  // by $.id (ref TradeChangeDetectionJob.java:56-64)
  private val tradeUpdates = Seq(
    ("T1", """{"id":"T1","price":100,"qty":5}"""),
    ("T2", """{"id":"T2","price":50,"qty":1}"""),
    ("T1", """{"id":"T1","price":101,"qty":5}"""),   // price change
    ("T2", """{"id":"T2","price":50,"qty":1}"""),    // unchanged resend
    ("T1", """{"id":"T1","price":101,"qty":7,"venue":"X"}""")) // qty + added

  test("kafka source schema and per-partition offsets match the contract") {
    val dir = newBroker()
    FileBroker.createTopic(dir, "t", 2)
    FileBroker.send(dir, "t", 0, "k0".getBytes, "v0".getBytes, 1000L)
    FileBroker.send(dir, "t", 1, "k1".getBytes, "v1".getBytes, 2000L)
    FileBroker.send(dir, "t", 0, null, "v2".getBytes, 3000L)

    val got = spark.read.format("graft-kafka")
      .option(KafkaMock.BrokerDirKey, dir).option("subscribe", "t").load()
    assert(got.schema.fieldNames.toSeq ===
      Seq("key", "value", "topic", "partition", "offset", "timestamp", "timestampType"))
    val rows = got.select(col("partition"), col("offset"),
        col("key").cast("string"), col("value").cast("string"),
        unix_micros(col("timestamp")))
      .as[(Int, Long, String, String, Long)].collect().sorted.toSeq
    assert(rows === Seq(
      (0, 0L, "k0", "v0", 1000000L),
      (0, 1L, null, "v2", 3000000L),
      (1, 0L, "k1", "v1", 2000000L)))
  }

  test("trade CDC end-to-end: broker -> source -> keyed diff -> kafka sink -> broker") {
    val dir = newBroker()
    FileBroker.createTopic(dir, "trades", 2)
    FileBroker.createTopic(dir, "trade-changes", 1)
    tradeUpdates.foreach { case (k, v) => FileBroker.sendString(dir, "trades", k, v) }

    // the job's own topology, bootstrap pointed at the mock
    val out = TradeChangeDetectionJob.changes(spark, s"mock:$dir", "trades")
      .select(col("tradeId").as("key"), to_json(col("diffs")).as("value"))
    val q = out.writeStream
      .format("graft-kafka")
      .option(KafkaMock.BrokerDirKey, dir).option("topic", "trade-changes")
      .option("checkpointLocation", Files.createTempDirectory("ckpt").toString)
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()

    val changes = spark.read.format("graft-kafka")
      .option(KafkaMock.BrokerDirKey, dir).option("subscribe", "trade-changes").load()
      .select(col("key").cast("string"), col("value").cast("string"))
      .as[(String, String)].collect().toSeq.sortBy(_._2)

    // first occurrences emit nothing; unchanged resend emits nothing;
    // the two real changes come out keyed by trade id (ref :89-111)
    assert(changes.map(_._1) === Seq("T1", "T1"))
    assert(changes(0)._2.contains(""""field":"price""""))
    assert(changes(0)._2.contains("MODIFIED"))
    assert(changes(1)._2.contains(""""field":"qty""""))
    assert(changes(1)._2.contains(""""field":"venue""""))
    assert(changes(1)._2.contains("ADDED"))
  }

  test("checkpoint resume continues from committed offsets without replay") {
    val dir = newBroker()
    FileBroker.createTopic(dir, "t", 1)
    val ckpt = Files.createTempDirectory("ckpt").toString
    val got = new java.util.concurrent.ConcurrentLinkedQueue[String]()

    def start() = spark.readStream.format("graft-kafka")
      .option(KafkaMock.BrokerDirKey, dir).option("subscribe", "t")
      .option("startingOffsets", "earliest").load()
      .selectExpr("CAST(value AS STRING) AS v")
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.as[String].collect().foreach(got.add)
      }.start()

    FileBroker.sendString(dir, "t", "k", "r1")
    FileBroker.sendString(dir, "t", "k", "r2")
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    assert(got.toArray.toSeq === Seq("r1", "r2"))

    FileBroker.sendString(dir, "t", "k", "r3")
    val q2 = start(); q2.processAllAvailable(); q2.stop()
    // r1/r2 not replayed: the restarted query resumed from the
    // checkpointed offset map, Kafka-consumer-group style
    assert(got.toArray.toSeq === Seq("r1", "r2", "r3"))
  }

  test("startingOffsets=latest skips the backlog") {
    val dir = newBroker()
    FileBroker.createTopic(dir, "t", 1)
    FileBroker.sendString(dir, "t", "k", "old")
    val got = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val q = spark.readStream.format("graft-kafka")
      .option(KafkaMock.BrokerDirKey, dir).option("subscribe", "t")
      .option("startingOffsets", "latest").load()
      .selectExpr("CAST(value AS STRING) AS v")
      .writeStream.option("checkpointLocation",
        Files.createTempDirectory("ckpt").toString)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.as[String].collect().foreach(got.add)
      }.start()
    q.processAllAvailable()
    FileBroker.sendString(dir, "t", "k", "new")
    q.processAllAvailable(); q.stop()
    assert(got.toArray.toSeq === Seq("new"))
  }

  test("one Spark input partition per broker partition (read parallelism contract)") {
    val dir = newBroker()
    FileBroker.createTopic(dir, "t", 4)
    (0 until 4).foreach { p =>
      FileBroker.send(dir, "t", p, null, s"v$p".getBytes, 0L)
    }
    val df = spark.read.format("graft-kafka")
      .option(KafkaMock.BrokerDirKey, dir).option("subscribe", "t").load()
    assert(df.rdd.getNumPartitions === 4)
    // and each Spark partition holds exactly its broker partition's data
    val perPart = df.select(col("partition")).rdd
      .mapPartitions(it => Iterator(it.map(_.getInt(0)).toSet)).collect()
    assert(perPart.forall(_.size == 1))
    assert(perPart.flatten.toSet === Set(0, 1, 2, 3))
  }

  test("offset json round-trips in the Kafka source's shape") {
    val o = graft.sources.kafka.KafkaMockOffset("trades", Map(0 -> 12L, 1 -> 7L))
    assert(o.json() === """{"trades":{"0":12,"1":7}}""")
    assert(KafkaMock.parseOffsets(o.json()) === Map(0 -> 12L, 1 -> 7L))
  }

  test("real-broker branch resolves the exact reference option map (swap-in golden)") {
    // TradeChangeDetectionJob.java:30-37 builds its source with
    // setBootstrapServers("broker:29092") / setTopics("trades") /
    // setGroupId("trade-change-detector") / OffsetsInitializer
    // .earliest(). The spark-sql-kafka jar cannot load here (zero
    // egress), so the swap-in claim is pinned where it CAN be: the
    // (format, options) kafkaRecords hands readStream must be exactly
    // the documented mapping of that builder.
    val (fmt, opts) = graft.streaming.StreamSources.kafkaPlan(
      "broker:29092", "trades", Some("trade-change-detector"))
    assert(fmt === "kafka")
    assert(opts === Map(
      "kafka.bootstrap.servers" -> "broker:29092",
      "subscribe"               -> "trades",
      "startingOffsets"         -> "earliest",
      "kafka.group.id"          -> "trade-change-detector"))
    // without a group id the option is absent, not empty
    val (_, noGroup) = graft.streaming.StreamSources.kafkaPlan(
      "broker:29092", "trades")
    assert(!noGroup.contains("kafka.group.id"))
    // and the mock branch routes to the in-repo DSv2 broker with the
    // same subscribe/offset options, so topology downstream is shared
    val (mockFmt, mockOpts) = graft.streaming.StreamSources.kafkaPlan(
      "mock:/tmp/broker", "trades")
    assert(mockFmt === "graft-kafka")
    assert(mockOpts(KafkaMock.BrokerDirKey) === "/tmp/broker")
    assert(mockOpts("subscribe") === "trades")
    assert(mockOpts("startingOffsets") === "earliest")
  }
}
