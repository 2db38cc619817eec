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

  test("bucketed tables join without an exchange (co-located join)") {
    // managed tables land in ./spark-warehouse (the static default —
    // session-level warehouse.dir can't be changed); DROP TABLE below
    // removes the data
    val t = Tables(spark, sf())
    Sinks.parquetBucketed(
      t.orders.select(col("o_custkey"), col("o_totalprice")),
      "b_orders", 4, Seq("o_custkey"))
    Sinks.parquetBucketed(
      t.customer.select(col("c_custkey"), col("c_name")),
      "b_customer", 4, Seq("c_custkey"))
    // force a sort-merge join so the plan would NEED an exchange if the
    // bucketing were not honored
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"),
          col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join should be shuffle-free:\n$plan")
      // and it computes the same result as the plain (shuffled) join
      val expected = t.orders.join(t.customer,
        col("o_custkey") === col("c_custkey")).count()
      assert(joined.count() === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }

  test("compactParquetDir glues a fragmented directory to the target file count") {
    val out = Files.createTempDirectory("graft-compact").toString + "/frag"
    // a deliberately fragmented write: 64 files for a few hundred KB
    Tables(spark, sf()).documents.repartition(64)
      .write.mode("overwrite").parquet(out)
    def dataFiles() = new java.io.File(out).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(dataFiles() === 64)
    val before = spark.read.parquet(out).orderBy(col("doc_id")).collect()
    // target far above the dir's bytes -> everything glues into 1 file
    val n = Sinks.compactParquetDir(spark, out, targetBytes = 1L << 30)
    assert(n === 1 && dataFiles() === 1)
    val after = spark.read.parquet(out).orderBy(col("doc_id")).collect()
    assert(after.toSeq === before.toSeq) // rewrite moved bytes, not rows
    // a small target splits: ceil(bytes / target) files
    val bytes = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    val n2 = Sinks.compactParquetDir(spark, out, targetBytes = bytes / 3)
    assert(n2 >= 3 && dataFiles() === n2)
  }

  test("compactParquetDir rejects a partitioned root loudly") {
    val out = Files.createTempDirectory("graft-compact-part").toString + "/root"
    Sinks.parquetPartitioned(Tables(spark, sf()).documents, out, Seq("lang"))
    val e = intercept[IllegalArgumentException] {
      Sinks.compactParquetDir(spark, out)
    }
    assert(e.getMessage.contains("partitioned root"))
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
