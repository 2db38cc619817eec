package graft.jobs

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.GraftSession
import graft.streaming._

/** Runnable analogs of the 8 reference programs (SURVEY.md file
  * inventory) — same names, Spark-first topologies. Socket/Kafka jobs
  * expect the corresponding endpoint to exist, exactly like the
  * reference demos.
  */

/** ref DataStreamJob.java — env bootstrap skeleton. */
object DataStreamJob {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    println(s"graft session up: ${spark.version}")
    spark.stop()
  }
}

/** ref WindowWordCount.java — socket → tokenize → rolling count. */
object WindowWordCountJob {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val lines = StreamSources.socketLines(spark,
      args.headOption.getOrElse("localhost"),
      args.lift(1).map(_.toInt).getOrElse(9999))
    WordCountStreams.rollingWordCount(lines)
      .writeStream.outputMode("update").format("console")
      .start().awaitTermination()
  }
}

/** ref AdvancedWordCount.java — normalize → tokenize → stopwords → count. */
object AdvancedWordCountJob {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val lines = StreamSources.socketLines(spark,
      args.headOption.getOrElse("localhost"),
      args.lift(1).map(_.toInt).getOrElse(9999))
    WordCountStreams.advancedWordCount(lines)
      .writeStream.outputMode("update").format("console")
      .start().awaitTermination()
  }
}

/** ref EventTimeWordCountDebug.java — event-time windows + late split. */
object EventTimeWordCountJob {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val lines = StreamSources.socketLines(spark,
      args.headOption.getOrElse("localhost"),
      args.lift(1).map(_.toInt).getOrElse(9999))
    val tsWords = EventTimeOps.parseTimestampedWords(lines)
    val splitter = new EventTimeOps.LateSplitter(delayMs = 10000)
    splitter.writer(tsWords)(
      onTime = (df, id) => { println(s"WINDOW_COUNTS batch $id"); df.show(false) },
      late   = (df, id) => { println(s"TOO_LATE batch $id"); df.show(false) })
      .start().awaitTermination()
  }
}

/** ref UserClickCounter.java — bounded in-memory clicks → running
  * counts. Pass `v2` to run the Spark-4 transformWithState form
  * (named ValueState, RocksDB state store) over a MemoryStream. */
object UserClickCounterJob {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    import spark.implicits._
    val data = Seq(
      Click("user1", 1, "click"), Click("user2", 2, "click"),
      Click("user1", 3, "click"), Click("user3", 4, "click"),
      Click("user2", 5, "click"), Click("user1", 6, "click"))
    if (args.headOption.contains("v2")) {
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Click]
      val q = StatefulV2.clickCounts(in.toDS())
        .writeStream.format("console").outputMode("append")
        .option("truncate", "false").start()
      in.addData(data.take(3)); q.processAllAvailable()
      in.addData(data.drop(3)); q.processAllAvailable()
      q.stop()
    } else {
      StatefulOps.clickCounts(data.toDS()).show(false)
    }
    spark.stop()
  }
}

/** ref UserEventListState.java — bounded events → list snapshots. */
object UserEventListStateJob {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    import spark.implicits._
    val events = Seq(
      UserEvent("user1", 1, "login"), UserEvent("user2", 2, "view"),
      UserEvent("user1", 3, "click"), UserEvent("user2", 4, "logout"),
      UserEvent("user1", 5, "purchase")).toDS()
    StatefulOps.eventLists(events).show(false)
    spark.stop()
  }
}

/** ref FraudDetectorExample.java — 9-txn scenario → 2 alerts. */
object FraudDetectorJob {
  /** The reference's hardcoded scenario (FraudDetectorExample.java:47-58). */
  val referenceTxns: Seq[Transaction] = Seq(
    Transaction("user1", 120, 1000), Transaction("user1", 250, 2000),
    Transaction("user1", 300, 2500), Transaction("user2", 50, 3000),
    Transaction("user1", 200, 4000), Transaction("user1", 500, 15000),
    Transaction("user2", 700, 16000), Transaction("user2", 800, 18000),
    Transaction("user2", 900, 19000))

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    import spark.implicits._
    if (args.headOption.contains("v2")) {
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Transaction]
      val q = StatefulV2.fraudAlerts(in.toDS())
        .writeStream.format("console").outputMode("append")
        .option("truncate", "false").start()
      in.addData(referenceTxns.take(5)); q.processAllAvailable()
      in.addData(referenceTxns.drop(5)); q.processAllAvailable()
      q.stop()
    } else {
      StatefulOps.fraudAlerts(referenceTxns.toDS()).show(false)
    }
    spark.stop()
  }
}

/** ref kafka/TradeChangeDetectionJob.java — Kafka JSON CDC. Args:
  * bootstrap (a real broker, or `mock:<dir>` for the file-backed
  * contract mock), input topic, optionally an output topic — given
  * one, changes are produced back to Kafka keyed by trade id (K3, ref
  * :48) instead of printed — and optionally `--checkpoint=<loc>`
  * (a flag, usable with or without an output topic: pass it to keep a
  * pre-existing run's committed offsets; otherwise a
  * (bootstrap, topics)-keyed tmpdir default is used). */
object TradeChangeDetectionJob {

  /** The topology, sink-agnostic: kafka records → keyed JSON CDC. */
  def changes(spark: SparkSession, bootstrap: String, topic: String)
      : org.apache.spark.sql.Dataset[TradeChange] = {
    import spark.implicits._
    // Kafka offsets are the arrival-order seq: per-partition ordered,
    // which is exactly the ordering guarantee the reference's Flink
    // consumer has. (monotonically_increasing_id is rejected in
    // streaming plans and wouldn't encode cross-batch order anyway.)
    val records = StreamSources.kafkaRecords(spark, bootstrap, topic,
      Some("trade-change-detector"))
    val trades = records.select(
        get_json_object(col("value"), "$.id").as("id"),
        col("offset").as("seq"),
        col("value").as("payload"))
      .as[Trade]
    StatefulOps.tradeChanges(trades)
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    // --checkpoint= is a FLAG, not positional: a console-sink
    // deployment (no output topic) must be able to pass it without a
    // path being mistaken for a Kafka output topic — that deployment
    // is exactly the keep-your-committed-offsets migration case
    val (ckptFlags, positional) =
      args.partition(_.startsWith("--checkpoint="))
    val ckptOverride =
      ckptFlags.lastOption.map(_.stripPrefix("--checkpoint="))
    // FAIL LOUD on extra positionals: the pre-flag interface took the
    // checkpoint as a 4th POSITIONAL arg — silently ignoring it here
    // would start a fresh keyed checkpoint and, with
    // startingOffsets=latest, skip every record since that
    // deployment's committed head. The one failure this flag migration
    // exists to prevent must not be reintroduced by the migration.
    require(positional.length <= 3,
      s"unexpected argument '${positional(3)}': the checkpoint location " +
        "moved from the 4th positional argument to --checkpoint=<loc>")
    val bootstrap = positional.headOption.getOrElse("localhost:29092")
    val topic = positional.lift(1).getOrElse("trades")
    val out = changes(spark, bootstrap, topic)
      .select(col("tradeId"), to_json(col("diffs")).as("changes"))
    val writer = positional.lift(2) match {
      case Some(outTopic) => // K3: produce (key=id, value=changes JSON)
        val (fmt, opts) =
          if (bootstrap.startsWith("mock:"))
            ("graft-kafka", Map(graft.sources.kafka.KafkaMock.BrokerDirKey ->
              bootstrap.stripPrefix("mock:")))
          else ("kafka", Map("kafka.bootstrap.servers" -> bootstrap))
        out.select(col("tradeId").as("key"), col("changes").as("value"))
          .writeStream.format(fmt).options(opts).option("topic", outTopic)
      case None =>
        out.writeStream.format("console")
    }
    // checkpoint: the explicit --checkpoint= flag wins — an EXISTING
    // deployment must pass its old location (e.g. the pre-keyed
    // /tmp/graft-trade-cdc) or its committed offsets are abandoned
    // and, with startingOffsets=latest, the records in between
    // silently skipped. Default: keyed by (bootstrap, topics) — a
    // rerun against a different broker/topic must NOT resume another
    // run's offsets — Kafka checkpoints embed the source
    // topic+offsets, and a reused location either fails or silently
    // skips records.
    val ckpt = ckptOverride.getOrElse {
      val ckptKey = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$bootstrap#$topic#${positional.lift(2).getOrElse("")}"
          .getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString.take(12)
      s"${sys.props("java.io.tmpdir")}/graft-trade-cdc-$ckptKey"
    }
    writer.outputMode("append")
      .option("checkpointLocation", ckpt)
      .start().awaitTermination()
  }
}
