package graft

import org.apache.spark.sql.functions._

/** The frequent-items sketch twin's contract (x_heavy_shingles_topk,
  * prodVariants): EXACT while a group's distinct count fits
  * maxTracked (counts equal truth, recall total — tie order at the
  * k boundary is the only freedom), the classic never-miss guarantee
  * for genuinely heavy items under capacity pressure, and the plan
  * shape the sketch exists for — map-side partials, one group-keyed
  * exchange carrying sketches. */
class FrequentItemsSpec extends SparkTestBase {
  import spark.implicits._

  test("under capacity the top-k is the exact top-k (modulo boundary ties)") {
    val got = graft.queries.AnalysisQueries
      .heavyShinglesTopK(spark, sf(), k = 20, maxTracked = 100000)
      .collect()
      .map(r => (r.getString(0), r.getString(2), r.getLong(3)))
    // in-JVM truth from the same staged shingle derivation
    val toks = split(col("text"), "\\s+")
    val exact = graft.sources.Tables(spark, sf()).documents
      .select(col("source"), toks.as("__toks"))
      .select(col("source"),
        explode_outer(graft.ext.Dedup.shingles3(col("__toks"))).as("ng"))
      .filter(col("ng").isNotNull)
      .groupBy("source", "ng").count()
      .as[(String, String, Long)].collect()
      .groupBy(_._1).map { case (s, rows) =>
        s -> rows.map(r => r._2 -> r._3).toMap }
    for ((src, ng, est) <- got) {
      assert(exact(src)(ng) === est,
        s"$src/$ng: under capacity the sketch count must be exact")
    }
    for ((src, truth) <- exact) {
      val returned = got.filter(_._1 == src).map(_._2).toSet
      val kth = truth.values.toSeq.sorted(Ordering[Long].reverse)
        .take(20).lastOption.getOrElse(0L)
      // every item STRICTLY above the k-th count must be present; at
      // exactly the k-th count ties may be broken either way
      for ((ng, c) <- truth if c > kth)
        assert(returned(ng), s"$src/$ng (count $c > kth $kth) missing")
    }
  }

  test("a genuinely heavy item survives capacity pressure (never-miss)") {
    // 1 item with 500 occurrences drowning in 2000 singletons, sketch
    // capped at 64 tracked items: the ItemsSketch guarantee is that
    // no item with true count above the error bound is evicted
    val rows = Seq.fill(500)("HEAVY") ++ (1 to 2000).map(i => s"one$i")
    val df = scala.util.Random.shuffle(rows).toDF("x")
    val top = df.selectExpr("approx_top_k(x, 5, 64) AS t")
      .select(explode(col("t"))).select("col.item", "col.count")
      .as[(String, Long)].collect().toMap
    assert(top.contains("HEAVY"), s"heavy item evicted: $top")
    assert(top("HEAVY") >= 500L && top("HEAVY") <= 2500L,
      s"estimate out of the sketch's bound: ${top("HEAVY")}")
  }

  test("the sketch plan partial-aggregates map-side (sketches on the wire)") {
    val plan = graft.queries.AnalysisQueries
      .heavyShinglesTopK(spark, sf())
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_approx_top_k"),
      s"expected a map-side frequent-items partial:\n$plan")
    assert("hashpartitioning".r.findAllIn(plan).length == 1 &&
      plan.contains("hashpartitioning(source#"),
      s"one source-keyed exchange expected:\n$plan")
  }
}
