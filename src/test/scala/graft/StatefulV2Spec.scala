package graft

import graft.streaming._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** transformWithState (Spark 4 arbitrary-state API) goldens — the same
  * reference scenarios as StatefulStreamingSpec, through named
  * ValueState/ListState, plus streaming dedup. transformWithState
  * requires the RocksDB state store provider.
  */
class StatefulV2Spec extends SparkTestBase {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def withRocksDB[A](f: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try f finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("T1 via transformWithState ValueState: reference click golden") {
    withRocksDB {
      val in = MemoryStream[Click]
      val q = StatefulV2.clickCounts(in.toDS())
        .writeStream.format("memory").queryName("v2_t1").outputMode("append").start()
      in.addData(Click("user1", 1, "click"), Click("user2", 2, "click"))
      q.processAllAvailable()
      in.addData(Click("user1", 3, "click"), Click("user3", 4, "click"),
                 Click("user2", 5, "click"), Click("user1", 6, "click"))
      q.processAllAvailable(); q.stop()
      val rows = spark.table("v2_t1").as[ClickCount].collect()
      assert(rows.length === 6)
      val finalCounts = rows.groupBy(_.userId).view.mapValues(_.map(_.clicks).max).toMap
      assert(finalCounts === Map("user1" -> 3, "user2" -> 2, "user3" -> 1))
    }
  }

  test("T2 via transformWithState ListState: snapshots accumulate, O(1) append") {
    withRocksDB {
      val in = MemoryStream[UserEvent]
      val q = StatefulV2.eventLists(in.toDS())
        .writeStream.format("memory").queryName("v2_t2").outputMode("append").start()
      in.addData(UserEvent("user1", 1, "login"), UserEvent("user2", 2, "view"))
      q.processAllAvailable()
      in.addData(UserEvent("user1", 3, "click"), UserEvent("user2", 4, "logout"),
                 UserEvent("user1", 5, "purchase"))
      q.processAllAvailable(); q.stop()
      val byUser = spark.table("v2_t2").as[EventListSnapshot].collect()
        .groupBy(_.userId).view.mapValues(_.maxBy(_.events.length).events.toList).toMap
      assert(byUser === Map(
        "user1" -> List("login", "click", "purchase"),
        "user2" -> List("view", "logout")))
    }
  }

  test("T2 ListState with TTL: idle state expires, fresh appends survive") {
    withRocksDB {
      // TTL puts the operator in processing-time mode, where the armed
      // query CONTINUOUSLY schedules micro-batches to service expiry —
      // so neither processAllAvailable nor Trigger.AvailableNow ever
      // sees a terminal quiet point. Drive by polling the sink for the
      // expected row count instead, then stop the query.
      val in = MemoryStream[UserEvent]
      val q = StatefulV2.eventLists(in.toDS(),
          org.apache.spark.sql.streaming.TTLConfig(java.time.Duration.ofMillis(500)))
        .writeStream.format("memory").queryName("v2_t2_ttl").outputMode("append")
        .start()
      def awaitRows(n: Long): Unit = {
        val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
        while (spark.table("v2_t2_ttl").count() < n) {
          assert(System.nanoTime() < deadline, s"sink never reached $n rows")
          Thread.sleep(100)
        }
      }
      try {
        in.addData(UserEvent("user1", 1, "login"), UserEvent("user1", 2, "view"))
        awaitRows(2)
        // batch 1 accumulated normally
        assert(spark.table("v2_t2_ttl").as[EventListSnapshot].collect()
          .map(_.events.toList).toSet === Set(List("login"), List("login", "view")))
        // let the TTL lapse well past the 500 ms bound, then touch the key
        Thread.sleep(2500)
        in.addData(UserEvent("user1", 3, "click"))
        awaitRows(3)
        // the post-TTL snapshot sees ONLY the fresh append: the idle
        // key's earlier entries were expired by the store itself
        // (RocksDB TTL tracking), no user-code sweep. Were TTL inert
        // this would be List("login","view","click").
        assert(spark.table("v2_t2_ttl").as[EventListSnapshot].collect()
          .map(_.events.toList).toSet ===
          Set(List("login"), List("login", "view"), List("click")))
      } finally q.stop()
    }
  }

  test("T3 via transformWithState ListState+ValueState: reference fraud golden") {
    withRocksDB {
      val in = MemoryStream[Transaction]
      val q = StatefulV2.fraudAlerts(in.toDS())
        .writeStream.format("memory").queryName("v2_t3").outputMode("append").start()
      val txns = graft.jobs.FraudDetectorJob.referenceTxns
      in.addData(txns.take(5)); q.processAllAvailable()
      in.addData(txns.drop(5)); q.processAllAvailable(); q.stop()
      val alerts = spark.table("v2_t3").as[FraudAlert].collect().sortBy(_.timestamp)
      assert(alerts.map(a => (a.userId, a.timestamp, a.recentCount)).toSeq ===
        Seq(("user1", 2500L, 3), ("user2", 19000L, 3)))
    }
  }

  test("T4 via transformWithState ValueState: reference CDC golden") {
    withRocksDB {
      val in = MemoryStream[Trade]
      val q = StatefulV2.tradeChanges(in.toDS())
        .writeStream.format("memory").queryName("v2_t4").outputMode("append").start()
      val t0 = """{"id":"TRD1","symbol":"AAPL","price":10.32}"""
      in.addData(Trade("TRD1", 1, t0)) // first occurrence: silent
      q.processAllAvailable()
      in.addData(Trade("TRD1", 2, t0)) // identical resend: silent
      q.processAllAvailable()
      in.addData(Trade("TRD1", 3, """{"id":"TRD1","symbol":"AAPL","price":11.00}""")) // modified
      in.addData(Trade("TRD1", 4, """{"id":"TRD1","symbol":"AAPL","price":11.00,"trader":"t9"}""")) // added
      q.processAllAvailable()
      in.addData(Trade("TRD1", 5, """{"id":"TRD1","symbol":"AAPL","price":11.00}""")) // removed
      q.processAllAvailable(); q.stop()
      val changes = spark.table("v2_t4").as[TradeChange].collect().sortBy(_.seq)
      assert(changes.map(_.seq).toSeq === Seq(3L, 4L, 5L))
      assert(changes(0).diffs.map(d => (d.field, d.action)) === Seq(("price", "MODIFIED")))
      assert(changes(0).diffs.head.old_value === "10.32")
      assert(changes(0).diffs.head.new_value === "11.0")
      assert(changes(1).diffs.map(d => (d.field, d.action)) === Seq(("trader", "ADDED")))
      assert(changes(2).diffs.map(d => (d.field, d.action)) === Seq(("trader", "REMOVED")))
    }
  }

  test("streaming session_window merges events within the gap") {
    val in = MemoryStream[(Long, String)]
    val df = in.toDF().toDF("ts_ms", "user")
      .withColumn("ts", timestamp_millis(col("ts_ms")))
    val q = df.withWatermark("ts", "5 seconds")
      .groupBy(session_window(col("ts"), "10 seconds"), col("user"))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_micros(col("session_window.start")).as("s_us"), col("user"), col("cnt"))
      .writeStream.format("memory").queryName("sess_out").outputMode("append").start()
    // u1: events at 1s and 8s merge (gap < 10s); the 40s event is separate
    in.addData((1000L, "u1"), (8000L, "u1"), (40000L, "u1"))
    q.processAllAvailable()
    in.addData((90000L, "u1")) // advance watermark, close earlier sessions
    q.processAllAvailable(); q.stop()
    val rows = spark.table("sess_out").as[(Long, String, Long)].collect().toSet
    assert(rows.contains((1000000L, "u1", 2L)))  // merged session of 2
    assert(rows.contains((40000000L, "u1", 1L)))
  }

  test("streaming dedup within watermark suppresses resends") {
    val in = MemoryStream[(Long, String)]
    val df = in.toDF().toDF("ts_ms", "k")
      .withColumn("ts", timestamp_millis(col("ts_ms")))
    val q = StreamDedup.withinWatermark(df, "ts", "10 seconds", Seq("k"))
      .writeStream.format("memory").queryName("dedup_out").outputMode("append").start()
    in.addData((1000L, "a"), (2000L, "a"), (3000L, "b"))
    q.processAllAvailable()
    in.addData((4000L, "a"), (5000L, "b"), (6000L, "c"))
    q.processAllAvailable(); q.stop()
    val keys = spark.table("dedup_out").select("k").as[String].collect().sorted
    assert(keys.toSeq === Seq("a", "b", "c"))
  }

  test("streaming sliding window counts (A4 streaming form)") {
    val in = MemoryStream[(Long, String)]
    val df = in.toDF().toDF("ts_ms", "word")
      .withColumn("ts", timestamp_millis(col("ts_ms")))
    val q = df.withWatermark("ts", "5 seconds")
      .groupBy(window(col("ts"), "10 seconds", "5 seconds"), col("word"))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_micros(col("window.start")).as("w_us"), col("word"), col("cnt"))
      .writeStream.format("memory").queryName("slide_out").outputMode("append").start()
    in.addData((1000L, "x"), (6000L, "x"))
    q.processAllAvailable()
    in.addData((30000L, "y")) // advance watermark, close early windows
    q.processAllAvailable(); q.stop()
    val rows = spark.table("slide_out").as[(Long, String, Long)].collect().toSet
    // x@1s in windows [-5,5) and [0,10); x@6s in [0,10) and [5,15)
    assert(rows.contains((0L, "x", 2L)))
    assert(rows.contains((-5000000L, "x", 1L)))
    assert(rows.contains((5000000L, "x", 1L)))
  }
}
