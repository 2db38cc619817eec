package graft

/** Plan-quality regression guard: builds the physical plan of every
  * registered query (no execution) and asserts the properties the 100 TB
  * design depends on — filters reach the parquet scans, no accidental
  * cartesian products, nested-loop joins only where a small probe set is
  * deliberately broadcast against the corpus.
  */
class PlanQualitySpec extends SparkTestBase {

  private lazy val qes: Map[String, org.apache.spark.sql.execution.QueryExecution] =
    SparkEntry.queries.map { case (name, fn) =>
      name -> fn(spark, sf()).queryExecution
    }

  private lazy val plans: Map[String, String] =
    qes.map { case (name, qe) => name -> qe.executedPlan.toString }

  /** Pairwise scans that intentionally broadcast a small side into a
    * non-equi join — plus x_tfidf_topk, whose "nested loop" is a 1-row
    * corpus-size scalar broadcast (the right plan at any scale). */
  private val intendedBnlj =
    Set("d6_ngram_jaccard", "y1_cosine_topk", "x_tfidf_topk",
      "y14_sq8_topk",       // y1's broadcast-probe pairwise scan, dequantized
      "x_media_ann",        // y14's shape over the media-feature codes:
                            // 16 featurized probes broadcast into the
                            // packed-artifact scan
      "x_frame_ann",        // same shape at frame granularity: the
                            // probe clips' frames broadcast into the
                            // corpus-frame scan
      "x_mixture_weights",  // 1-row corpus-totals broadcast, like tfidf's N
      "x_balanced_sample",  // same 1-row totals broadcast via its rate frame
      "x_lm_score",         // 1-row bigram-type-count broadcast, same shape
      "x_ppl_buckets",      // inherits x_lm_score's 1-row broadcast
      "x_dsir_weights",     // 1-row target/raw-totals broadcast
      "d17_lsh_recall_audit", // four 1-row audit counters crossJoined
      "y16_ivf_recall_audit", // its truth side is a deliberate broadcast
      "y16_ivf_recall_np2",   // pairwise scan on the audit slice (y1's
                              // shape) + the d17 counter crossJoins
      "y16_ivf_recall_clustered", // same audit core over the clustered
                                  // fixture — same deliberate truth scan
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
    // the chunked prefix-max keeps the EVENT-level window PARTITION BY
    // chunk (the carry window over the chunk-level frame is global by
    // construction, but bounded at n/chunkSize rows)
    val w = plans("w5_late_data_audit")
    assert(w.contains("chunk"), "w5 lost its chunked window")
    // the carry-in is computed executor-side (a window over the
    // chunk-level frame), never collected to the driver — a regression
    // to the collect+scanLeft form shows up as a LocalTableScan of
    // driver-built rows
    assert(!w.contains("LocalTableScan"),
      "w5 carry regressed to a driver-side collect (LocalTableScan)")
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

  /** The file-header rule of RelationalQueries, encoded: a FORCED
    * broadcast (an explicit `broadcast()` hint surviving into the
    * optimized plan) whose subtree scans a corpus-scaled table RAW —
    * no aggregate/limit/sample collapsing its cardinality between the
    * scan and the hint — is a multi-GB driver-side build at 100x and
    * the exact anti-pattern r9 purged from q5/q8/q9 and r10 found
    * reintroduced in q3. Size-CHOSEN broadcasts (AQE / stats at small
    * SF) are fine and not flagged: only the hint forces the plan at
    * every scale. region/nation are true dimensions and always
    * allowed. */
  private def forcedCorpusBroadcasts(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Seq[String] = {
    import org.apache.spark.sql.catalyst.plans.logical._
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    // the five corpus-scaled TPC-H carriers (the verdict's list).
    // events/documents/embeddings are deliberately NOT here: the
    // pairwise similarity registrations broadcast fixed-cardinality
    // probe SLICES of them (vec_id < 16 — bounded at any corpus size),
    // which a path-level detector cannot tell from a scaling slice;
    // those plans are individually adjudicated in intendedBnlj above.
    val corpus = Set("customer", "orders", "lineitem", "part", "supplier")
    def rawCorpusScan(p: LogicalPlan): Option[String] = {
      val shrunk = p.exists {
        case _: Aggregate | _: GlobalLimit | _: Sample => true
        case _ => false
      }
      if (shrunk) None
      else p.collect {
        case lr: LogicalRelation => lr.relation match {
          case r: HadoopFsRelation => r.location.rootPaths.toSeq.flatMap(rp =>
            corpus.find(t => rp.getName == s"$t.parquet" ||
              rp.toString.contains(s"/$t.parquet")))
          case _ => Nil
        }
      }.flatten.headOption
    }
    plan.collect {
      case j: Join =>
        val sides = Seq(j.hint.leftHint -> j.left, j.hint.rightHint -> j.right)
        sides.flatMap { case (h, side) =>
          if (h.exists(_.strategy.contains(BROADCAST))) rawCorpusScan(side)
          else None
        }
    }.flatten
  }

  test("no registered plan force-broadcasts a corpus-scaled table") {
    val offenders = qes.toSeq.flatMap { case (name, qe) =>
      forcedCorpusBroadcasts(qe.optimizedPlan).map(t => s"$name($t)")
    }
    assert(offenders.isEmpty,
      s"forced corpus-table broadcasts (file-header rule): $offenders")
  }

  test("the forced-broadcast detector rejects a deliberately hinted probe") {
    import org.apache.spark.sql.functions.{broadcast, col}
    val t = graft.sources.Tables(spark, sf())
    // capture each accessor once: every Tables call builds a fresh plan
    val (li, cust, nat, reg) = (t.lineitem, t.customer, t.nation, t.region)
    val bad = li.join(
      broadcast(cust.filter(col("c_mktsegment") === "BUILDING")),
      li("l_orderkey") === cust("c_custkey"))
    assert(forcedCorpusBroadcasts(bad.queryExecution.optimizedPlan)
        .contains("customer"),
      "detector missed a forced broadcast of a filtered customer slice")
    // and the allowed shapes stay allowed: a broadcast 1-row aggregate
    val okAgg = li.join(broadcast(cust.groupBy().count()))
    assert(forcedCorpusBroadcasts(okAgg.queryExecution.optimizedPlan).isEmpty,
      "detector flagged a 1-row aggregate broadcast")
    // ...and a broadcast true dimension
    val okDim = nat.join(broadcast(reg),
      nat("n_regionkey") === reg("r_regionkey"))
    assert(forcedCorpusBroadcasts(okDim.queryExecution.optimizedPlan).isEmpty,
      "detector flagged a region/nation dimension broadcast")
  }
}
