package graft

import graft.streaming._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

/** MemoryStream goldens for the keyed-state quartet, using the reference
  * programs' own hardcoded inputs (FIXTURES.md A3-A6). Inputs are fed in
  * multiple micro-batches so cross-batch state is actually exercised.
  */
class StatefulStreamingSpec extends SparkTestBase {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def runToTable[T](q: StreamingQuery): Unit = {
    q.processAllAvailable(); q.stop()
  }

  test("T1 click counter golden: user1->3, user2->2, user3->1, per-record emission") {
    val in = MemoryStream[Click]
    val q = StatefulOps.clickCounts(in.toDS())
      .writeStream.format("memory").queryName("t1_out").outputMode("append").start()
    in.addData(Click("user1", 1, "click"), Click("user2", 2, "click"))
    q.processAllAvailable()
    in.addData(Click("user1", 3, "click"), Click("user3", 4, "click"))
    q.processAllAvailable()
    in.addData(Click("user2", 5, "click"), Click("user1", 6, "click"))
    runToTable(q)
    val rows = spark.table("t1_out").as[ClickCount].collect()
    assert(rows.length === 6) // one emission per input record
    val finalCounts = rows.groupBy(_.userId).view.mapValues(_.map(_.clicks).max).toMap
    assert(finalCounts === Map("user1" -> 3, "user2" -> 2, "user3" -> 1))
    assert(rows.exists(_.message == "user1 has clicked 3 times."))
  }

  test("T2 event list golden: snapshots accumulate across batches") {
    val in = MemoryStream[UserEvent]
    val q = StatefulOps.eventLists(in.toDS())
      .writeStream.format("memory").queryName("t2_out").outputMode("append").start()
    in.addData(UserEvent("user1", 1, "login"), UserEvent("user2", 2, "view"))
    q.processAllAvailable()
    in.addData(UserEvent("user1", 3, "click"), UserEvent("user2", 4, "logout"),
               UserEvent("user1", 5, "purchase"))
    runToTable(q)
    val rows = spark.table("t2_out").as[EventListSnapshot].collect()
    assert(rows.length === 5) // snapshot per input record
    val finalByUser = rows.groupBy(_.userId).view
      .mapValues(_.maxBy(_.events.length).events.toList).toMap
    assert(finalByUser === Map(
      "user1" -> List("login", "click", "purchase"),
      "user2" -> List("view", "logout")))
  }

  test("T3 fraud golden: reference 9-txn scenario -> exactly 2 alerts") {
    val in = MemoryStream[Transaction]
    val q = StatefulOps.fraudAlerts(in.toDS())
      .writeStream.format("memory").queryName("t3_out").outputMode("append").start()
    // feed in three micro-batches, preserving arrival order across them
    val txns = FraudDetectorJobTxns.all
    in.addData(txns.take(4)); q.processAllAvailable()
    in.addData(txns.slice(4, 7)); q.processAllAvailable()
    in.addData(txns.drop(7)); runToTable(q)
    val alerts = spark.table("t3_out").as[FraudAlert].collect().sortBy(_.timestamp)
    // user1: 120@1000, 250@2000, 300@2500 -> 3 in lookback => alert @2500;
    //        then throttled (4000, 15000 are within 10 min of 2500).
    // user2: 700@16000, 800@18000, 900@19000 -> alert @19000.
    assert(alerts.map(a => (a.userId, a.timestamp, a.recentCount)).toSeq ===
      Seq(("user1", 2500L, 3), ("user2", 19000L, 3)))
  }

  test("T3 fraud: throttle expires after 10 minutes") {
    val in = MemoryStream[Transaction]
    val q = StatefulOps.fraudAlerts(in.toDS())
      .writeStream.format("memory").queryName("t3b_out").outputMode("append").start()
    val base = Seq(
      Transaction("u", 200, 1000), Transaction("u", 200, 2000),
      Transaction("u", 200, 3000)) // alert @3000
    val afterThrottle = 3000L + 10 * 60 * 1000 + 1
    in.addData(base)
    q.processAllAvailable()
    // three more high-value txns past the throttle window; the old three
    // have been evicted by then (> 10 min lookback)
    in.addData(
      Transaction("u", 300, afterThrottle),
      Transaction("u", 300, afterThrottle + 10),
      Transaction("u", 300, afterThrottle + 20))
    runToTable(q)
    val alerts = spark.table("t3b_out").as[FraudAlert].collect().sortBy(_.timestamp)
    assert(alerts.map(_.timestamp).toSeq === Seq(3000L, afterThrottle + 20))
  }

  test("T4 trade CDC golden: first-seen silent, modified, added, removed, identical resend") {
    val in = MemoryStream[Trade]
    val q = StatefulOps.tradeChanges(in.toDS())
      .writeStream.format("memory").queryName("t4_out").outputMode("append").start()
    val t0 = """{"id":"TRD1","symbol":"AAPL","price":10.32}"""
    in.addData(Trade("TRD1", 1, t0)) // first occurrence: silent
    q.processAllAvailable()
    in.addData(Trade("TRD1", 2, t0)) // identical resend: silent
    q.processAllAvailable()
    in.addData(Trade("TRD1", 3, """{"id":"TRD1","symbol":"AAPL","price":11.00}""")) // modified
    in.addData(Trade("TRD1", 4, """{"id":"TRD1","symbol":"AAPL","price":11.00,"trader":"t9"}""")) // added
    q.processAllAvailable()
    in.addData(Trade("TRD1", 5, """{"id":"TRD1","symbol":"AAPL","price":11.00}""")) // removed
    runToTable(q)
    val changes = spark.table("t4_out").as[TradeChange].collect().sortBy(_.seq)
    assert(changes.map(_.seq).toSeq === Seq(3L, 4L, 5L))
    assert(changes(0).diffs.map(d => (d.field, d.action)) === Seq(("price", "MODIFIED")))
    assert(changes(0).diffs.head.old_value === "10.32")
    assert(changes(0).diffs.head.new_value === "11.0")
    assert(changes(1).diffs.map(d => (d.field, d.action)) === Seq(("trader", "ADDED")))
    assert(changes(2).diffs.map(d => (d.field, d.action)) === Seq(("trader", "REMOVED")))
  }
}

/** The reference's hardcoded fraud scenario
  * (FraudDetectorExample.java:47-58). */
object FraudDetectorJobTxns {
  val all: Seq[Transaction] = graft.jobs.FraudDetectorJob.referenceTxns
}
