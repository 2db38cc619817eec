package graft

import graft.ext.Salt
import graft.sources.{Sinks, Tables}
import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import java.nio.file.Files

class SinksAndSaltSpec extends SparkTestBase {
  import spark.implicits._

  test("partitioned parquet sink round-trips with partition pruning") {
    val out = Files.createTempDirectory("graft-sink").toString
    val docs = Tables(spark, sf()).documents
    Sinks.parquetPartitioned(docs, out, Seq("lang"))
    val back = spark.read.parquet(out)
    assert(back.count() === docs.count())
    // partition pruning: reading one lang only lists that directory
    val en = back.filter(col("lang") === "en")
    val plan = en.queryExecution.executedPlan.toString
    assert(en.count() ===
      docs.filter(col("lang") === "en").count())
    assert(new java.io.File(out).listFiles().exists(_.getName.startsWith("lang=")))
  }

  test("salted join equals plain join (deterministic salt)") {
    val orders = Tables(spark, sf()).orders
      .select(col("o_custkey"), col("o_totalprice"))
    val customer = Tables(spark, sf()).customer
      .select(col("c_custkey").as("o_custkey"), col("c_name"))
    val plain = orders.join(customer, "o_custkey")
    val salted = Salt.saltedJoin(orders, customer, "o_custkey", n = 8)
    assert(salted.count() === plain.count())
    val a = plain.groupBy("o_custkey").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = salted.groupBy("o_custkey").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
  }

  test("observe() metrics — the K4 debug side-channel mapping") {
    val obs = Observation("doc_stats")
    val docs = Tables(spark, sf()).documents
      .observe(obs, count(lit(1)).as("n_docs"), max(col("n_chars")).as("max_chars"))
    docs.write.format("noop").mode("overwrite").save()
    assert(obs.get("n_docs").asInstanceOf[Long] === 500L)
    assert(obs.get("max_chars").asInstanceOf[Long] > 0)
  }
}
