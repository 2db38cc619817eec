package graft

import graft.streaming._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming funnel state machine: per-advance emission, cross-batch
  * state, and — the load-bearing contract — exact agreement with the
  * batch `a11_funnel` min-chain stages on the real events table. */
class StreamFunnelSpec extends SparkTestBase {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("golden: advances emit per stage transition, state crosses batches") {
    val in = MemoryStream[FunnelEvent]
    val q = StreamFunnel.advances(in.toDS())
      .writeStream.format("memory").queryName("funnel_out")
      .outputMode("append").start()
    // batch 1: u1 reaches stage 1 (the later duplicate view is ignored),
    // u2 sees a click with no prior view — no advance
    in.addData(
      FunnelEvent(1L, 100L, "view", 1), FunnelEvent(1L, 200L, "view", 2),
      FunnelEvent(2L, 150L, "click", 3))
    q.processAllAvailable()
    // batch 2: u1 clicks (stage 2) then purchases (stage 3) — state
    // carried the stage-1 timestamp across the restart of the fold;
    // u2's view starts their funnel (the earlier click cannot count:
    // it is in the past and stages are strictly ordered forward)
    in.addData(
      FunnelEvent(1L, 300L, "click", 4), FunnelEvent(1L, 400L, "purchase", 5),
      FunnelEvent(2L, 500L, "view", 6))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("funnel_out").as[FunnelAdvance].collect()
    val byUser = rows.groupBy(_.userId).view.mapValues(_.sortBy(_.stage)).toMap
    assert(byUser(1L).map(_.stage).toList === List(1, 2, 3))
    assert(byUser(1L).last === FunnelAdvance(1L, 3, Some(100L), Some(300L), Some(400L)))
    assert(byUser(2L).map(_.stage).toList === List(1)) // click-before-view never counted
    assert(rows.length === 4) // one row per advance, none otherwise
  }

  test("same-timestamp next-stage event does not advance (strict > chain)") {
    val (out, st) = StreamFunnel.advance(
      FunnelState(0, None, None, None),
      Seq(FunnelEvent(7L, 100L, "view", 1), FunnelEvent(7L, 100L, "click", 2),
          FunnelEvent(7L, 101L, "click", 3)))
    assert(st === FunnelState(2, Some(100L), Some(101L), None))
    assert(out.map(_.stage) === Seq(1, 2))
  }

  test("transformWithState twin: same golden through a named ValueState on RocksDB") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[FunnelEvent]
      val q = StreamFunnel.advancesV2(in.toDS())
        .writeStream.format("memory").queryName("funnel_v2_out")
        .outputMode("append").start()
      in.addData(
        FunnelEvent(1L, 100L, "view", 1), FunnelEvent(2L, 150L, "click", 2))
      q.processAllAvailable()
      in.addData(
        FunnelEvent(1L, 300L, "click", 3), FunnelEvent(1L, 400L, "purchase", 4))
      q.processAllAvailable(); q.stop()
      val rows = spark.table("funnel_v2_out").as[FunnelAdvance].collect()
        .sortBy(_.stage)
      assert(rows.map(_.stage).toList === List(1, 2, 3))
      assert(rows.last === FunnelAdvance(1L, 3, Some(100L), Some(300L), Some(400L)))
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("state machine over the real events table equals the batch a11_funnel stages") {
    val dir = sf("sf0.001")
    // run the batch registered query...
    val batch = graft.queries.EventQueries.funnel(spark, dir)
      .select(col("user_id"), col("stage"), col("s1_us"), col("s2_us"), col("s3_us"))
      .as[(Long, Long, Option[Long], Option[Long], Option[Long])]
      .collect().map(r => r._1 -> ((r._2.toInt, r._3, r._4, r._5))).toMap
    // ...and the state machine over the same rows (flatMapGroupsWithState
    // in batch execution folds each user once; the operator's own
    // (tsUs, seq) sort supplies the event-time order)
    val evs = graft.sources.Tables(spark, dir).events
      .select(col("user_id").as("userId"), col("ts_us").as("tsUs"),
        col("event_type").as("eventType"), col("event_id").as("seq"))
      .as[FunnelEvent]
    val machine = StreamFunnel.advances(evs).collect()
      .groupBy(_.userId).view.mapValues { adv =>
        val last = adv.maxBy(_.stage)
        (last.stage, last.s1Us, last.s2Us, last.s3Us)
      }.toMap
    // every user the machine advanced must match the batch stages; users
    // the machine never emitted for must be stage 0 in the batch
    batch.foreach { case (user, (stage, s1, s2, s3)) =>
      machine.get(user) match {
        case Some(m) => assert(m === ((stage, s1, s2, s3)),
          s"user $user: machine $m vs batch ${(stage, s1, s2, s3)}")
        case None => assert(stage === 0, s"user $user: batch stage $stage but no advances")
      }
    }
    assert(batch.nonEmpty && machine.nonEmpty)
  }
}
