package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamRules
import java.nio.file.Files

/** The dynamic-rules stream: a rule swap between triggers changes
  * what the NEXT batch flags — no restart, no checkpoint surgery —
  * and a missing rule set fails loud instead of flagging nothing. */
class StreamRulesSpec extends SparkTestBase {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def publish(path: String, rules: Seq[(String, Double)]): Unit =
    graft.core.IndexStore.replace(spark, path) { scratch =>
      rules.toDF("event_type", "min_value")
        .coalesce(1).write.mode("overwrite").parquet(scratch)
    }

  test("a rule swap between triggers reflags the next batch") {
    val rules = Files.createTempDirectory("graft-rules").toString + "/r"
    val ckpt = Files.createTempDirectory("graft-rules-ckpt").toString
    publish(rules, Seq("purchase" -> 100.0))

    val alerts = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, Double)]()
    val in = MemoryStream[(Long, String, Double)]
    val q = in.toDS().toDF("event_id", "event_type", "value").writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch(StreamRules.alertApplier(rules, (df, _) =>
        df.select("event_id", "event_type", "value")
          .collect().foreach(r =>
            alerts.add((r.getLong(0), r.getString(1), r.getDouble(2))))))
      .start()

    in.addData((1L, "purchase", 150.0), (2L, "purchase", 50.0),
               (3L, "click", 999.0))
    q.processAllAvailable()
    // threshold 100, no click rule: only event 1 flags
    assert(alerts.toArray.toSet === Set((1L, "purchase", 150.0)))

    publish(rules, Seq("purchase" -> 40.0, "click" -> 500.0))
    in.addData((4L, "purchase", 50.0), (5L, "click", 999.0),
               (6L, "click", 100.0))
    q.processAllAvailable()
    q.stop()
    // the SAME values that passed batch 1 now flag under the new rules
    assert(alerts.toArray.toSet === Set(
      (1L, "purchase", 150.0), (4L, "purchase", 50.0), (5L, "click", 999.0)))
  }

  test("no committed rule set fails loud, not silently alert-free") {
    val rules = Files.createTempDirectory("graft-rules2").toString + "/missing"
    val e = intercept[IllegalArgumentException] {
      StreamRules.currentRules(spark, rules)
    }
    assert(e.getMessage.contains("rule set"))
  }
}
