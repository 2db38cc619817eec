package graft

import graft.ext.SketchStore
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The materialized-sketch store's contracts: a store built from
  * partitioned ingest batches estimates within a tight band (≤2%) of
  * the single-shot sketch — NOT bit-identical: DataSketches HLL
  * union's sparse-promotion order shifts the estimator ~1%, a claim
  * this spec originally made as equality and measurement refuted —
  * while both track the true distinct within HLL error, and appending
  * a batch writes only that batch's kilobyte sketch rows — history is
  * never rescanned. */
class SketchStoreSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val shingles = {
    val toks = split(col("text"), "\\s+")
    graft.sources.Tables(spark, sf()).documents
      .select(col("doc_id"), col("source"), toks.as("__toks"))
      .select(col("doc_id"), col("source"),
        explode_outer(graft.ext.Dedup.shingles3(col("__toks"))).as("ng"))
      .filter(col("ng").isNotNull)
  }

  test("batch-appended store tracks the single-shot sketch within 2%, and exact within HLL error") {
    val path = Files.createTempDirectory("graft-skstore").toString + "/store"
    // three ingest batches by doc id, each seeing ONLY its own slice
    for (b <- 0 to 2)
      assert(SketchStore.ingest(
        shingles.filter(pmod(col("doc_id"), lit(3)) === b),
        "source", "ng", path, s"b$b"))
    val merged = SketchStore.estimate(spark, path)
      .as[(String, Long)].collect().toMap
    val single = shingles.groupBy(col("source").as("grp"))
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(ng, 12))").as("est"))
      .as[(String, Long)].collect().toMap
    assert(merged.keySet === single.keySet)
    for ((src, m) <- merged) {
      val band = math.abs(m - single(src)).toDouble / single(src)
      assert(band <= 0.02,
        s"$src: merged $m vs single-shot ${single(src)}, gap $band > 2%")
    }
    val exact = shingles.groupBy(col("source"))
      .agg(countDistinct(col("ng")).as("d"))
      .as[(String, Long)].collect().toMap
    for ((src, d) <- exact) {
      val err = math.abs(merged(src) - d).toDouble / d
      assert(err <= 0.05, s"$src: estimate ${merged(src)} vs exact $d, err $err")
    }
  }

  test("ingest commits per batch: torn dirs invisible, retries idempotent, history untouched") {
    val path = Files.createTempDirectory("graft-skstore2").toString + "/store"
    assert(SketchStore.ingest(shingles, "source", "ng", path, "base"))
    val sources = shingles.select("source").distinct().count()
    val before = SketchStore.readStore(spark, path)
    assert(before.count() === sources, "one sketch row per (group, batch)")
    // the store's rows are kilobytes however large the corpus: that
    // byte-bound is the query-cost claim, so pin it
    val maxLen = before.select(max(length(col("sketch")))).head().getInt(0)
    assert(maxLen <= (16 << 10), s"sketch row unexpectedly large: $maxLen bytes")
    assert(SketchStore.ingest(shingles.limit(50), "source", "ng", path, "late"))
    val after = SketchStore.readStore(spark, path)
    assert(after.count() > sources && after.count() <= sources * 2)
    assert(after.filter(col("batch_tag") === "base").count() === sources,
      "base rows untouched by the append")
    // a RETRY of a committed tag is a no-op, not a duplicate row set
    assert(!SketchStore.ingest(shingles.limit(50), "source", "ng", path, "late"))
    assert(SketchStore.readStore(spark, path).count() === after.count())
    // a torn ingest (data present, no marker) is invisible to readers
    Seq(("x", Array[Byte](1))).toDF("grp", "sketch")
      .write.parquet(s"$path/batch_tag=torn")
    new java.io.File(s"$path/batch_tag=torn/_SUCCESS").delete()
    assert(!SketchStore.readStore(spark, path).select("batch_tag")
      .as[String].collect().contains("torn"))
  }
}
