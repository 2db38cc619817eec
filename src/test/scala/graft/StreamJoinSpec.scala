package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-stream and stream-static joins — beyond the reference's
  * surface (it has no joins at all, SURVEY.md §2.8) but core to a
  * complete streaming engine. Stream-stream joins buffer both sides in
  * watermark-bounded state; the time-range condition is what lets the
  * engine evict (unbounded join state is the 100 TB failure mode). */
class StreamJoinSpec extends SparkTestBase {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("stream-stream inner join within a 10s event-time bound") {
    val clicks = MemoryStream[(Long, String)]
    val buys = MemoryStream[(Long, String)]
    val c = clicks.toDF().toDF("c_ms", "user")
      .withColumn("c_ts", timestamp_millis(col("c_ms"))).withWatermark("c_ts", "10 seconds")
    val b = buys.toDF().toDF("b_ms", "b_user")
      .withColumn("b_ts", timestamp_millis(col("b_ms"))).withWatermark("b_ts", "10 seconds")
    val joined = c.join(b,
      col("user") === col("b_user") &&
      col("b_ts") >= col("c_ts") && col("b_ts") <= col("c_ts") + expr("INTERVAL 10 SECONDS"))
    val q = joined.select(col("user"), col("c_ms"), col("b_ms"))
      .writeStream.format("memory").queryName("ssj_out").outputMode("append").start()
    clicks.addData((1000L, "u1"), (2000L, "u2"))
    buys.addData((5000L, "u1"), (30000L, "u2")) // u1 within 10s; u2 not
    q.processAllAvailable()
    val rows = spark.table("ssj_out").as[(String, Long, Long)].collect().toSet
    assert(rows === Set(("u1", 1000L, 5000L)))
    q.stop()
  }

  test("stream-static join enriches a stream with a dimension table") {
    val ev = MemoryStream[(Long, Long)] // (event_id, user_id)
    val cust = spark.read.parquet(sf() + "/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment"))
    val joined = ev.toDF().toDF("event_id", "user_id")
      .join(broadcast(cust), col("user_id") === col("c_custkey"))
    val q = joined.select(col("event_id"), col("c_mktsegment"))
      .writeStream.format("memory").queryName("stj_out").outputMode("append").start()
    ev.addData((1L, 1L), (2L, 2L), (3L, 999999L)) // last has no dim match
    q.processAllAvailable()
    val rows = spark.table("stj_out").as[(Long, String)].collect()
    assert(rows.map(_._1).toSet === Set(1L, 2L))
    assert(rows.forall(_._2.nonEmpty))
    q.stop()
  }
}
