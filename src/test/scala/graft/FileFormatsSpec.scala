package graft

import graft.sources.Tables
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** File-format source/sink coverage (extended scope — the reference has
  * no file scans at all, SURVEY.md §2.8): CSV, JSON, ORC, text
  * roundtrips with explicit schemas, plus the streaming file source.
  * Explicit schemas everywhere: schema inference is a full extra pass
  * over the data — never acceptable at 100 TB. */
class FileFormatsSpec extends SparkTestBase {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private lazy val docs = Tables(spark, sf()).documents
    .select(col("doc_id"), col("text"), col("lang"), col("n_chars"))

  private def tmp(suffix: String) =
    Files.createTempDirectory(s"graft-fmt-$suffix").toString

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("n_chars", LongType)))

  test("csv roundtrip with explicit schema and header") {
    val p = tmp("csv")
    docs.write.mode("overwrite").option("header", "true").csv(p)
    val back = spark.read.schema(docSchema).option("header", "true").csv(p)
    assert(back.count() === docs.count())
    assert(back.agg(sum("n_chars")).head.getLong(0) ===
      docs.agg(sum("n_chars")).head.getLong(0))
  }

  test("json-lines roundtrip with explicit schema") {
    val p = tmp("json")
    docs.write.mode("overwrite").json(p)
    val back = spark.read.schema(docSchema).json(p)
    assert(back.orderBy("doc_id").as[(Long, String, String, Long)].collect().toSeq ===
      docs.orderBy("doc_id").as[(Long, String, String, Long)].collect().toSeq)
  }

  test("orc roundtrip preserves data and pushes filters") {
    val p = tmp("orc")
    docs.write.mode("overwrite").orc(p)
    val back = spark.read.orc(p).filter(col("lang") === "en")
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"), "orc scan lost filter pushdown")
    assert(back.count() === docs.filter(col("lang") === "en").count())
  }

  test("text sink/source for raw lines") {
    val p = tmp("text")
    docs.select(col("text")).write.mode("overwrite").text(p)
    val back = spark.read.text(p)
    assert(back.count() === docs.count())
  }

  test("streaming file source picks up parquet files with the given schema") {
    val dir = tmp("stream-src")
    docs.limit(100).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(docs.schema).parquet(dir)
    assert(stream.isStreaming)
    val q = stream.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("fsrc_out").outputMode("complete").start()
    q.processAllAvailable()
    val total = spark.table("fsrc_out").agg(sum("n")).head.getLong(0)
    assert(total === 100L)
    q.stop()
  }
}
