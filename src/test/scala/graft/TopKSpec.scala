package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.TopK

/** The custom-plan tier (logical node + strategy + partial/final exec):
  * per-key top-k must agree with the rank-window reference, plan with
  * both exec phases and no Window/Sort, and stay correct under
  * repartitioning (the partial phase sees arbitrary row placement).
  */
class TopKSpec extends SparkTestBase {
  import spark.implicits._

  private def events =
    graft.sources.Tables(spark, sf()).events
      .select(col("event_type"), col("event_id"), col("value"))

  private def reference(k: Int) = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value").desc, col("event_id").asc)
    events.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("event_type"), col("event_id"), col("value"))
  }

  private def custom(k: Int, parts: Int) = {
    val base = events.repartition(parts)
    TopK.perKey(base, Seq("event_type"),
      Seq("value" -> true, "event_id" -> false), k)
  }

  test("matches the rank-window reference across k and partitioning") {
    for (k <- Seq(1, 5, 100); parts <- Seq(1, 7)) {
      val expect = reference(k).collect().map(_.toString).sorted.toSeq
      val got = custom(k, parts).collect().map(_.toString).sorted.toSeq
      assert(got === expect, s"k=$k parts=$parts")
    }
  }

  test("k larger than any group passes everything through") {
    assert(custom(1000000, 3).count() === events.count())
  }

  test("plans as partial + shuffle + final; any sort covers only survivors") {
    val plan = custom(3, 7).queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKeyPartial"), "missing map-side partial")
    assert(plan.contains("TopKPerKeyFinal"), "missing reduce-side final")
    assert(plan.contains("Exchange"), "missing the key shuffle")
    assert(!plan.contains("WindowExec") && !plan.contains("Window "), "regressed to a rank window")
    // the partial must run BELOW the exchange (cutting shuffle volume)
    val pPartial = plan.indexOf("TopKPerKeyPartial")
    val pExchange = plan.indexOf("Exchange")
    assert(pExchange < pPartial, "partial is not below the exchange")
    // the grouped final requests a key-sort of the shuffled SURVIVORS
    // (spillable SortExec above the exchange); the full input below the
    // exchange must never be sorted
    val pSort = plan.indexOf("Sort ")
    if (pSort >= 0) {
      assert(pSort < pExchange, "sort ran below the exchange (full input)")
      assert(plan.indexOf("Sort ", pExchange) < 0, "a second sort below the exchange")
    }
  }

  test("partial heap map flushes at the key threshold without losing rows") {
    val key = "spark.graft.topk.partialFlushKeys"
    spark.conf.set(key, "2") // events has 5 event types -> several flushes
    try {
      val expect = reference(5).collect().map(_.toString).sorted.toSeq
      val got = custom(5, 7).collect().map(_.toString).sorted.toSeq
      assert(got === expect)
    } finally spark.conf.unset(key)
  }

  test("float keys normalize: -0.0 groups with 0.0, NaN bit patterns unify") {
    val weirdNaN = java.lang.Double.longBitsToDouble(0x7ff8000000000001L)
    val df = Seq((0.0, 1L), (-0.0, 2L), (Double.NaN, 3L), (weirdNaN, 4L))
      .toDF("k", "id")
    // one group for +-0.0 and one for both NaNs -> top-1 keeps 2 rows
    val got = TopK.perKey(df, Seq("k"), Seq("id" -> false), 1)
      .select("id").as[Long].collect().toSet
    assert(got === Set(1L, 3L))
  }

  test("resolution is case-insensitive by default and rejects ambiguity") {
    val df = Seq(("a", 1L, 2.0)).toDF("Key", "id", "v")
    assert(TopK.perKey(df, Seq("key"), Seq("ID" -> false), 1).count() === 1)
    val dup = df.select(col("Key"), col("id"), col("v"), col("id").as("ID"))
    val err = intercept[IllegalArgumentException] {
      TopK.perKey(dup, Seq("Key"), Seq("id" -> false), 1)
    }
    assert(err.getMessage.contains("ambiguous"))
  }

  test("rewrite is gated by spark.graft.topk.rewriteEnabled") {
    ensureRewriteRule()
    val key = "spark.graft.topk.rewriteEnabled"
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value").desc, col("event_id").asc)
    def idiom = events
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5).drop("rn")
    spark.conf.set(key, "false")
    try
      assert(!idiom.queryExecution.executedPlan.toString.contains("TopKPerKey"),
        "rewrite fired while disabled")
    finally spark.conf.unset(key)
  }

  test("a long rank bound below Int.MinValue is not rewritten to a positive k") {
    ensureRewriteRule()
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value").desc, col("event_id").asc)
    val alwaysFalse = events
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= lit(-4294967293L)).drop("rn")
    assert(!alwaysFalse.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    assert(alwaysFalse.count() === 0)
  }

  private def ensureRewriteRule(): Unit = {
    import graft.plans.RewriteRankFilterToTopK
    if (!spark.experimental.extraOptimizations.contains(RewriteRankFilterToTopK))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteRankFilterToTopK
    if (!spark.experimental.extraStrategies.contains(graft.plans.GraftStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.GraftStrategy
  }

  test("optimizer rule rewrites the rank-filter idiom to TopKPerKey") {
    ensureRewriteRule()

    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value").desc, col("event_id").asc)
    val idiom = events
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5).drop("rn")

    val plan = idiom.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKeyFinal"), "rank-filter idiom not rewritten")
    assert(!plan.contains("WindowExec"), "window survived the rewrite")

    // and the rewritten result equals the un-rewritten window form
    val expect = reference(5).collect().map(_.toString).sorted.toSeq
    assert(idiom.collect().map(_.toString).sorted.toSeq === expect)
  }

  test("optimizer rule leaves ineligible shapes alone") {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value").desc, col("event_id").asc)
    // rn kept in the output -> not a pure top-k, must stay a window
    val keepsRank = events
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
    assert(!keepsRank.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    // rank() (ties share numbers) is not row_number -> must stay a window
    val rankFn = events
      .withColumn("rk", rank().over(w)).filter(col("rk") <= 5).drop("rk")
    assert(!rankFn.queryExecution.executedPlan.toString.contains("TopKPerKey"))
  }

  test("duplicate order values at the boundary resolve by the tie-break column") {
    val df = Seq(("a", 1L, 10.0), ("a", 2L, 10.0), ("a", 3L, 10.0), ("b", 4L, 5.0))
      .toDF("k", "id", "v")
    val got = TopK.perKey(df, Seq("k"),
        Seq("v" -> true, "id" -> false), 2)
      .select("k", "id").as[(String, Long)].collect().toSet
    assert(got === Set(("a", 1L), ("a", 2L), ("b", 4L)))
  }
}
