package graft

import graft.streaming._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

/** State durability: keyed state survives a query stop/restart from the
  * checkpoint — the Spark analog of Flink's checkpointed state backend
  * (SURVEY.md §2.6 state-backend notes). The memory sink is not
  * checkpoint-recoverable, so the sink is foreachBatch into a buffer.
  */
class RecoverySpec extends SparkTestBase {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("click-counter state survives restart from checkpoint") {
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val got = new java.util.concurrent.ConcurrentLinkedQueue[ClickCount]()
    val in = MemoryStream[Click]
    val counts = StatefulOps.clickCounts(in.toDS())
    def start() = counts.writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[ClickCount], _: Long) =>
        batch.collect().foreach(got.add)
      }
      .start()

    val q1 = start()
    in.addData(Click("u1", 1, "click"), Click("u1", 2, "click"))
    q1.processAllAvailable()
    q1.stop()
    assert(got.size === 2)

    // restart from the SAME checkpoint: offsets + per-key state resume
    val q2 = start()
    in.addData(Click("u1", 3, "click"))
    q2.processAllAvailable()
    q2.stop()

    val all = got.toArray(Array.empty[ClickCount]).sortBy(_.clicks)
    // the post-restart record continues from state count=2 -> emits 3,
    // and the pre-restart batches are not replayed
    assert(all.map(_.clicks).toSeq === Seq(1, 2, 3))
    assert(all.last.message === "u1 has clicked 3 times.")
  }

  test("kafka source wrapper fails with the connector-missing error (jar not bundled here)") {
    // The spark-sql-kafka connector isn't in /opt/spark/jars (zero-egress
    // container); assert the wrapper reaches Kafka source resolution so
    // the wiring itself is known-correct.
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      StreamSources.kafkaLines(spark, "localhost:29092", "trades", Some("g"))
    }
    assert(e.getMessage.contains("kafka"))
  }
}
