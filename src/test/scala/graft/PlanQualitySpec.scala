package graft

/** Plan-quality regression guard: builds the physical plan of every
  * registered query (no execution) and asserts the properties the 100 TB
  * design depends on — filters reach the parquet scans, no accidental
  * cartesian products, nested-loop joins only where a small probe set is
  * deliberately broadcast against the corpus.
  */
class PlanQualitySpec extends SparkTestBase {

  private lazy val plans: Map[String, String] =
    SparkEntry.queries.map { case (name, fn) =>
      name -> fn(spark, sf()).queryExecution.executedPlan.toString
    }

  /** Pairwise scans that intentionally broadcast a small side into a
    * non-equi join — plus x_tfidf_topk, whose "nested loop" is a 1-row
    * corpus-size scalar broadcast (the right plan at any scale). */
  private val intendedBnlj =
    Set("d6_ngram_jaccard", "y1_cosine_topk", "x_tfidf_topk",
      "y14_sq8_topk",       // y1's broadcast-probe pairwise scan, dequantized
      "x_mixture_weights",  // 1-row corpus-totals broadcast, like tfidf's N
      "x_balanced_sample",  // same 1-row totals broadcast via its rate frame
      "x_lm_score",         // 1-row bigram-type-count broadcast, same shape
      "x_ppl_buckets",      // inherits x_lm_score's 1-row broadcast
      "x_dsir_weights",     // 1-row target/raw-totals broadcast
      "d17_lsh_recall_audit", // four 1-row audit counters crossJoined
      "q22_dormant_customers", // 1-row positive-balance-average broadcast
      "q11_important_stock") // 1-row total/count scalar broadcast (q22 shape)

  test("no CartesianProduct anywhere") {
    val offenders = plans.collect {
      case (n, p) if p.contains("CartesianProduct") => n
    }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }

  test("BroadcastNestedLoopJoin only in intended pairwise scans") {
    val offenders = plans.collect {
      case (n, p) if p.contains("BroadcastNestedLoopJoin") && !intendedBnlj(n) => n
    }
    assert(offenders.isEmpty, s"unintended nested-loop joins in: $offenders")
  }

  test("selective scans push their filters to parquet") {
    for (q <- Seq("q6_forecast_revenue", "q3_shipping_priority", "q1_pricing_summary")) {
      assert(plans(q).contains("PushedFilters: ["), s"$q lost scan pushdown")
    }
    assert(plans("q6_forecast_revenue").contains("l_shipdate"),
      "q6 shipdate predicate not pushed")
  }

  test("t5 json diff is fully declarative (no UDF nodes)") {
    assert(!plans("t5_json_diff").toLowerCase.contains("udf"),
      "t5 regressed to a UDF")
  }

  test("w5 audit windows are partitioned (no single-partition WindowExec)") {
    // the chunked prefix-max keeps every window PARTITION BY chunk; a
    // regression to the global form would show a windowspecdefinition
    // whose partition spec is empty
    val w = plans("w5_late_data_audit")
    assert(w.contains("chunk"), "w5 lost its chunked window")
  }

  test("q_topk_per_key plans with the custom exec, not a rank window") {
    val p = plans("q_topk_per_key")
    assert(p.contains("TopKPerKeyPartial") && p.contains("TopKPerKeyFinal"),
      "custom top-k execs missing")
    assert(!p.contains("WindowExec"), "regressed to a rank window")
  }

  test("joins with dimension tables broadcast the dimension") {
    for (q <- Seq("q3_shipping_priority", "q5_local_supplier", "q_top_customers"))
      assert(plans(q).contains("BroadcastHashJoin"), s"$q lost broadcast join")
  }

  test("top-k queries use TakeOrderedAndProject, not a global sort+limit") {
    for (q <- Seq("q3_shipping_priority", "q_top_customers"))
      assert(plans(q).contains("TakeOrderedAndProject"), s"$q lost top-k")
  }
}
