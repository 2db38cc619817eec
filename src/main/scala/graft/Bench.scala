package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query at the given scale
  * factor and prints one JSON line.
  *
  * Each query is materialized through a `noop` datasource write — unlike
  * `count()`, which lets Catalyst prune the expensive projections out of
  * the plan, noop executes the full physical plan including every
  * computed column. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // one tiny warmup action so JVM/codegen startup isn't billed to the
    // first query
    spark.range(1000000).selectExpr("sum(id)").write
      .format("noop").mode("overwrite").save()
    // every corpus count is guarded: partial replicas exist for all
    // three tiers (an embeddings-only dir for the y-tier ladder, a
    // documents-only zipf dir) and a single-query dev drive must not
    // crash on a table it never reads
    val liRows =
      if (graft.sources.Tables.exists(spark, sfDir, "lineitem"))
        spark.read.parquet(s"$sfDir/lineitem.parquet").count()
      else 0L
    val docRows =
      if (graft.sources.Tables.exists(spark, sfDir, "documents"))
        spark.read.parquet(s"$sfDir/documents.parquet").count()
      else 0L
    val embRows =
      if (graft.sources.Tables.exists(spark, sfDir, "embeddings"))
        spark.read.parquet(s"$sfDir/embeddings.parquet").count()
      else 0L
    // ---- canary gate (r9-r11 asks): a contended host has produced and
    // COMMITTED bench artifacts up to 28x off the engine's real numbers
    // — and r11 proved a single lineitem canary is not enough: the
    // driver's BENCH_r11.json passed q1 at 669k rows/s while the
    // DOCUMENTS-tier rows ran up to 9.5x high (d4_simhash 7.18s vs a
    // judge-measured 0.76s) — page-cache/IO contention is per-corpus.
    // So before a FULL-suite run (args empty — the only shape that
    // mints a record), TWO canaries run median-of-3:
    //   q1_pricing_summary        — lineitem scan+agg (IO-bound shape)
    //   d2_minhash_sigs_xxh64     — documents shingle+hash projection
    //                               (the doc-corpus CPU+IO shape, no
    //                               DuckDB-tax noise)
    //   y14_sq8_topk              — embeddings corpus + the /tmp packed
    //                               codes artifact the 26-entry y-tier
    //                               reads (r12's last corpus blind
    //                               spot: a cold or contended artifact
    //                               dir was invisible to both other
    //                               canaries). Its first rep may pay
    //                               the one-time artifact build — the
    //                               median-of-3 discards that rep AND
    //                               leaves the artifact warm for the
    //                               suite.
    // If any canary's rows/s falls more than its tier's slack below
    // the committed record's (BENCH_FULL.json) — 1.5x for the
    // scan-bound q1/docs tiers, 2.25x for the overhead-dominated emb
    // tier (slack rationale at the gate below) — the run re-measures
    // that canary once, and refuses to mint if still below: one JSON
    // line with "degraded":true, exit 3, so no harness can silently
    // archive a garbage artifact. A record value only applies at ITS
    // scale factor; a record predating a canary's key gates on the
    // keys it has. SPARK_GRAFT_CANARY=off skips the gate for
    // deliberate debugging on a box known to be busy.
    //
    // ORDER MATTERS (r13): the gate runs BEFORE prepareFixtures — the
    // fixture builds are some of the heaviest jobs in the repo
    // (shingle→band→verify→CC), and a canary measured in their GC/
    // page-cache aftermath reads ~20% slow on an otherwise healthy
    // host (measured r13: docs canary 6.7k rows/s immediately after
    // the builds vs 8.1k standalone on the same box). Gating first
    // both removes that false-refusal bias and refuses a genuinely
    // contended host before wasting the fixture-build work. The
    // canary queries by construction read no prepared fixture (q1 and
    // d2 touch raw tables; y14 builds its own artifact via ensure —
    // its cold first rep is discarded by the median and leaves the
    // artifact warm for the suite).
    // LIKE-FOR-LIKE COMPARISON (r13): a canary runs in a young JVM —
    // first executions of its whole codegen pipeline — while the
    // committed record's suite throughputs were measured after 150+
    // queries had warmed the JIT. On the r12 box that bias fit inside
    // the 1.5x slack; the r13 box showed it can't be relied on (canary
    // d2 5.3k rows/s cold vs 8.1k suite-state on the SAME idle host —
    // a false refusal). Two measures: (a) each canary takes one
    // UNTIMED warmup execution before its timed median-of-3, and
    // (b) the record carries the CANARY-state measurements themselves
    // (canary_*_rps below, emitted in the summary prefix), which the
    // gate prefers over the suite-derived keys when present — so from
    // the first r13 record on, gates compare canary-state to
    // canary-state. Records predating canary_* keys fall back to the
    // suite-derived keys (with the known bias, at the same per-tier
    // slack the gate applies everywhere).
    val record = recordCanaries(sfDir)
    val canaryMeasured = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val gateRan = args.isEmpty &&
      sys.env.getOrElse("SPARK_GRAFT_CANARY", "on") != "off"
    if (gateRan) {
      runGate(spark, sfDir, liRows, docRows, embRows, record,
              canaryMeasured).foreach { refusal =>
        println(refusal)
        spark.stop()
        sys.exit(3)
      }
    }
    // untimed: the on-disk fixtures some registered queries READ (the
    // t6/t7/t8 upsert tables, the dedup cluster/label fixtures, the
    // media-SQ8 artifact) are built here — AFTER the gate, see above —
    // so the measured window prices the read only. Gated on the
    // request: a single-query dev iteration (explicit args touching
    // none of the fixture readers) must not pay the table builds.
    val wantedFixtures =
      if (args.isEmpty) SparkEntry.fixtureReaders
      else args.toSet.intersect(SparkEntry.fixtureReaders)
    if (wantedFixtures.nonEmpty)
      SparkEntry.prepareFixturesFor(spark, sfDir, wantedFixtures)
    // optional args = query names to time (iterating locally on one
    // query); the driver passes none and gets the full suite. The
    // xxh64 production twins (SparkEntry.prodVariants — same pipeline,
    // codegen-native hashes, no DuckDB oracle) are timed alongside so
    // the gate artifact carries md5/xxh64 paired rows for the
    // hash-priced queries.
    val timeable = SparkEntry.queries ++ SparkEntry.prodVariants
    val unknown = args.filterNot(timeable.keySet)
    require(unknown.isEmpty,
      s"unknown queries: ${unknown.mkString(", ")} — a typo here would " +
        "otherwise print a normal-looking zero-total JSON line")
    val wanted = timeable.toSeq.sortBy(_._1)
      .filter { case (n, _) => args.isEmpty || args.contains(n) }
    // single-shot timings on the heavy iterative queries (d7 and its
    // consumers) have shown up to 3.5x run-to-run GC/JIT variance, which
    // is more than the 2x-of-baseline acceptance envelope — so each
    // query is timed `reps` times and the MEDIAN is reported. The
    // measured window covers only the noop materialization; the
    // cache/persist teardown between reps runs outside it so RDD
    // unpersist cost (large for the CC-heavy queries) isn't billed to
    // the query.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    // self-healing records (r11 ask #1b): per-query medians that land
    // far off the previous committed record are re-measured up to
    // `healReps` more times IN the same session and the median over ALL
    // collected reps kept — a transient page-cache eviction or GC storm
    // on one query stops polluting round-over-round deltas. Threshold:
    // |median - prev| > max(0.5s, 50% of prev). Healing only widens the
    // sample; a genuine regression survives it (all reps agree).
    val healReps = sys.env.getOrElse("SPARK_GRAFT_HEAL_REPS", "2").toInt
    val prev: Map[String, Double] = loadPrevMap(sfDir)
    var healed = 0
    // per-query heal audit (r12 advisor): WHICH queries took extra reps
    // rides the record, so a smoothed step regression is visible in the
    // artifact instead of hiding inside one global counter
    val healedBy = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    val results = wanted.map { case (name, fn) =>
      def timeOnce(): Option[Double] = {
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            false
          }
        val elapsed = (System.nanoTime() - t0) / 1e9
        // drop query-local persists between reps (releaseAll frees the
        // RDD-backed CC results that clearCache cannot see) — NOT timed
        graft.core.CacheScope.releaseAll()
        spark.catalog.clearCache()
        if (ok) Some(elapsed) else None
      }
      def median(ts: Seq[Double]) = ts.sorted.apply(ts.size / 2)
      var times = (1 to reps).flatMap(_ => timeOnce())
      if (times.nonEmpty) prev.get(name).filter(_ >= 0).foreach { p =>
        var extra = 0
        var healthy = true
        while (healthy && extra < healReps &&
               math.abs(median(times) - p) > math.max(0.5, 0.5 * p)) {
          // only a rep that actually produced a sample counts as a
          // heal — a failing heal rep stops the loop and is never
          // reported in healed_reps (the counter exists so the record
          // analysis knows how many EXTRA samples widened the median)
          timeOnce() match {
            case Some(t) =>
              times = times :+ t; extra += 1; healed += 1
              healedBy(name) = healedBy.getOrElse(name, 0) + 1
            case None    => healthy = false
          }
        }
      }
      // failed queries report -1 so they're distinguishable in the JSON
      name -> (if (times.isEmpty) -1.0 else median(times))
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt3(v) }
      .mkString("{", ",", "}")
    // headline total covers the ORACLE-CHECKED registry only, so it
    // stays comparable round over round; the xxh64 twins get their own
    // side total
    val total = results.collect {
      case (k, v) if v >= 0 && SparkEntry.queries.contains(k) => v }.sum
    val prodTotal = results.collect {
      case (k, v) if v >= 0 && SparkEntry.prodVariants.contains(k) => v }.sum
    // headline throughput: rows scanned per second on each canary's
    // corpus — q1 (lineitem) and d2_xxh64 (documents); both ride the
    // summary so the NEXT run's gate can see both tiers
    val resMap = results.toMap
    val q1Sec = resMap.getOrElse("q1_pricing_summary", -1.0)
    val rps = if (q1Sec > 0) liRows / q1Sec else 0.0
    val d2Sec = resMap.getOrElse("d2_minhash_sigs_xxh64", -1.0)
    val docsRps = if (d2Sec > 0) docRows / d2Sec else 0.0
    val y14Sec = resMap.getOrElse("y14_sq8_topk", -1.0)
    val embRps = if (y14Sec > 0) embRows / y14Sec else 0.0
    val trend = prevDelta(results, prev)
    // ---- end-of-suite canary re-measure (r14 verdict #1): the start
    // gate is blind to contention that ARRIVES mid-suite — the r14
    // driver window passed all four canaries (shuffle 1.30x below the
    // record, inside its 2.0x slack) and then minted 214.7 s with
    // d7_dup_clusters 7.3x degraded. Re-measuring the same four tiers
    // AFTER the suite brackets the measured window from both ends: a
    // window whose end canaries fall more than the tier slack below
    // its own start canaries was contended DURING the suite, and the
    // artifact stamps itself "suspect" instead of needing a judge
    // re-measure to adjudicate. Two row-level clauses join the verdict
    // (see suspectEnd): distinct healed QUERIES above 10% of the
    // registry (contended host or garbage prior — medians not
    // record-grade either way), and registry rows landing >2x over
    // their committed-record medians on >5% of the registry (the r15
    // sub-slack window: individual rows 2.3x inflated while all four
    // brackets stayed inside slack).
    val canaryEnd = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    if (gateRan) tierChecks(liRows, docRows, embRows, record)
      .filter(_._3 > 0).foreach { case (tier, name, rows, _) =>
        canaryEnd(tier) = canaryRps(spark, sfDir, name, rows)
      }
    val startByTier = canaryMeasured.collect {
      case (k, v) if k.startsWith("canary_") && k.endsWith("_rps") =>
        k.stripPrefix("canary_").stripSuffix("_rps") -> v
    }.toMap
    // per-row conviction (r15 verdict #2): registry rows whose fresh
    // median exceeds the committed record's by >2x AND >0.5s absolute
    // (the healing floor — sub-second rows double on dispatch jitter
    // alone). Healing already widened these medians with extra reps,
    // so a row still counted here degraded persistently, not as a
    // one-rep burst.
    val inflated = results.count { case (name, cur) =>
      cur >= 0 && SparkEntry.queries.contains(name) &&
        prev.get(name).exists(p => p > 0 && cur > 2 * p && cur - p > 0.5)
    }
    val suspect = suspectEnd(startByTier, canaryEnd.toMap, healedBy.size,
      SparkEntry.queries.size, inflated)
    // KEY-ORDER CONTRACT (parsed by recordCanaries/loadPrevMap): the
    // summary scalars — "sf", "q1_rows_per_sec", "docs_rows_per_sec",
    // "emb_rows_per_sec" — are emitted BEFORE the "queries" map, and
    // the gate parser only reads the prefix up to "queries": so a
    // nested key can never shadow a top-level one.
    // gate_ref_*: the RECORD references each start canary was gated
    // against — emitted into the new artifact because the committed
    // record itself is overwritten by this very run, so without them a
    // later adjudicator cannot reconstruct what the gate compared
    // (the r15 mint trail had to be reconstructed from transcripts)
    val gateRefs =
      if (!gateRan) Seq.empty
      else tierChecks(liRows, docRows, embRows, record).collect {
        case (tier, _, rows, Some(r)) if rows > 0 => s"gate_ref_${tier}_rps" -> r
      }
    // the suspect verdict rides every FULL run — with the gate off it
    // still convicts on runaway healing alone, matching the
    // record-file routing below
    val canaryKeys = (canaryMeasured ++ gateRefs ++
        canaryEnd.map { case (t, v) => s"canary_end_${t}_rps" -> v })
      .map { case (k, v) => s""""$k":${fmt(v, "%.0f")},""" }.mkString +
      (if (args.isEmpty) s""""suspect":$suspect,""" else "")
    // artifact-cold marker: how many IndexStore artifacts this JVM
    // built from scratch (canary warmups + prepareFixtures + any lazy
    // first-touch build inside a timed rep). 0 = standing-artifact
    // session, comparable to the record like-for-like; large = the
    // measurement-aftermath class (r13's healed-32 mint followed a
    // fresh-tmpdir fixture build wave) — read deltas accordingly.
    val indexBuilds = graft.core.IndexStore.buildsThisJvm
    val scalars = s""""unit":"sec","sf":"$sfDir","lineitem_rows":$liRows,"documents_rows":$docRows,"embeddings_rows":$embRows,$canaryKeys"q1_rows_per_sec":${fmt(rps, "%.0f")},"docs_rows_per_sec":${fmt(docsRps, "%.0f")},"emb_rows_per_sec":${fmt(embRps, "%.0f")},"healed_reps":$healed,"inflated_rows":$inflated,"index_builds":$indexBuilds,"prod_variants_total":${fmt3(prodTotal)}"""
    val healedQueries = healedBy.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val byCost = results.sortBy { case (_, v) => -v }
      .map { case (k, v) => "\"" + k + "\":" + fmt3(v) }
    // Record-file routing — only a FULL, non-suspect run may touch the
    // committed record:
    //  - a self-adjudicated-suspect run writes the .suspect sidecar:
    //    every prior contended window (r13 279.6 s, r14 214.7 s)
    //    overwrote the healthy record and cost a round of
    //    driver-vs-committed adjudication;
    //  - a dev drive (explicit query args) writes BENCH_PARTIAL.json:
    //    a partial map over the committed record is pure loss (the r15
    //    session lost its two best mint windows to exactly this), and
    //    nothing consumes a partial map as a record.
    // The healthy record stays the gate/healing/prev_delta baseline in
    // all cases, and the stdout lines point at the file actually
    // written.
    val recordFile =
      if (args.nonEmpty) "BENCH_PARTIAL.json"
      else if (suspect) "BENCH_FULL.suspect.json"
      else "BENCH_FULL.json"
    val (fullLine, compactLine, trailerLine) =
      renderLines(total, scalars, healedQueries, qs, trend, byCost, recordFile)
    writeFile(recordFile, fullLine + "\n")
    println(fullLine) // head may be clipped by the tail capture; the file has it all
    println(compactLine)
    println(trailerLine)
    spark.stop()
  }

  /** The three stdout lines of a bench run, pure and spec-testable.
    * The gate harness stores only the LAST ~2000 chars of stdout, and
    * the full per-query map alone exceeds that — so the complete
    * record goes to a FILE (committed into the repo each round) and
    * stdout carries three lines covering BOTH truncation directions:
    *  1. the full record (same text as BENCH_FULL.json);
    *  2. a budget-aware compact twin — heaviest queries first, rows
    *     added until the line survives a 2000-char tail capture, with
    *     an explicit count of what was elided;
    *  3. LAST, a summary-only trailer with NO per-query map at all —
    *     bounded by the scalar key set, never by the registry size.
    * Line 3 exists because r13 proved the summary-first key order only
    * protects against TAIL-truncation: the driver's tail capture cut
    * the compact line's HEAD, losing every summary key while the
    * queries map survived ("parsed": null in BENCH_r13.json). A short
    * complete trailer as the final line survives a tail capture of any
    * budget >= its own length, whichever end got cut. */
  private[graft] def renderLines(total: Double, scalars: String,
                                 healedQueries: String, qs: String,
                                 trend: String,
                                 byCost: Seq[String],
                                 recordFile: String = "BENCH_FULL.json")
      : (String, String, String) = {
    val fullLine =
      s"""{"metric":"total","value":${fmt3(total)},$scalars,"healed_queries":$healedQueries,"queries":$qs$trend}"""
    val budget = 1500 // chars available for rows in the compact line
    val kept = scala.collection.mutable.ArrayBuffer.empty[String]
    var used = 0
    byCost.foreach { row =>
      if (used + row.length + 1 <= budget) { kept += row; used += row.length + 1 }
    }
    val omitted = byCost.length - kept.length
    val compactLine =
      s"""{"metric":"total","value":${fmt3(total)},$scalars,"healed_queries":$healedQueries,"n_queries":${byCost.length},"queries_omitted_here":$omitted,"full_map":"$recordFile","queries":${kept.mkString("{", ",", "}")}}"""
    val trailerLine =
      s"""{"metric":"total","value":${fmt3(total)},$scalars,"n_queries":${byCost.length},"full_map":"$recordFile"}"""
    (fullLine, compactLine, trailerLine)
  }

  /** Locale-pinned number formatting for every JSON-bound value: the
    * `f` interpolator formats with the JVM default locale, and a
    * comma-decimal locale would make the emitted line invalid JSON. */
  private[graft] def fmt(v: Double, pattern: String): String =
    String.format(java.util.Locale.ROOT, pattern, Double.box(v))
  private[graft] def fmt3(v: Double): String = fmt(v, "%.3f")

  /** The full-suite mint gate: canary-state median-of-3 throughput per
    * corpus tier vs the committed record, refusing to mint on a
    * contended host. Returns Some(refusal JSON line) when a tier stays
    * below its slack after one fresh re-measure, None when healthy;
    * `measured` accumulates one measurement per tier — the first when
    * no retry ran, the MEAN of first and retry when one did (r13
    * advisor killed best-of-two's upward bias; r14 advisor killed
    * first-only's downward one — a burst-slow first measurement
    * whose retry passed would commit a degraded reference and loosen
    * every future gate). The retry max stays the pass/fail arbiter.
    *
    * PER-TIER SLACK, calibrated to each canary's own measurement
    * noise (r13 continuation): the emb canary is a 2000-row query —
    * fixed overhead (job dispatch, codegen, artifact listing)
    * dominates, and three same-box measurements 25 minutes apart on
    * a host whose q1/docs canaries AND suite-state y14 were healthy
    * spanned 2321..3576 rows/s vs the record's 3759 — a 1.55x
    * legitimate spread, wider than the 1.5x slack, so the gate
    * refused two healthy windows. Slack must sit OUTSIDE the
    * estimator's own noise or the gate is a coin flip: emb gates at
    * 2.25x (still refuses the genuinely-starved artifact dir it was
    * built for — the r12 contended window measured >3x off); the
    * scan-bound q1/docs tiers keep 1.5x (their same-box spread is
    * ~10%).
    *
    * SHUFFLE TIER (r13 verdict #1): all three corpus canaries are
    * scan/hash-shaped, and the r13 driver window proved that shape
    * blind — q1 read only 1.24x degraded while the Expand/exchange/CC
    * tier ran 10-35x slow (q_cube 35.0 s vs 0.96 s idle), so a 279.6 s
    * garbage artifact minted with all canaries green. q_cube IS the
    * fourth canary: 4-grouping-set Expand + hash exchange over
    * lineitem, sub-second healthy, already in the registry. Its slack
    * is 2.0x — exchange-tier timings carry GC/task-dispatch variance a
    * scan doesn't (same-box canary-state spread measured r14: two
    * healthy mint windows 40 minutes apart measured 526.5k and 428.3k
    * rows/s — a 1.23x legitimate spread, wider than the q1 tier's
    * ~10%) — while the r13 contended window sat >30x off, far outside
    * any slack. Gated on its own canary_shuffle_rps record key only: no
    * suite-derived fallback exists in the prefix contract, so records
    * predating r14 simply don't gate this tier (the first r14 mint
    * arms it). */
  private[graft] def runGate(
      spark: SparkSession, sfDir: String,
      liRows: Long, docRows: Long, embRows: Long,
      record: Map[String, Double],
      measured: scala.collection.mutable.Map[String, Double]): Option[String] = {
    // rows > 0 guards a tier on a dir without its table: a zero-row
    // canary would read as infinitely slow and spuriously refuse (a
    // full-suite run needs the table anyway, but the gate must not be
    // the thing that crashes first). The iterator is lazy, so the
    // first refusal stops measuring the remaining tiers.
    tierChecks(liRows, docRows, embRows, record)
        .filter(_._3 > 0).iterator.flatMap { case (tier, name, rows, rec) =>
      val first = canaryRps(spark, sfDir, name, rows)
      measured(s"canary_${tier}_rps") = first
      rec.filter(_ > 0).flatMap { r =>
        val s = tierSlack(tier)
        // one fresh re-measure before refusing: a single canary
        // median has burst noise a refusal shouldn't ride on (the
        // same r13 box passed 3576 two minutes after refusing 2321);
        // a genuinely contended host fails both. When the retry ran,
        // the RECORDED reference is the mean of both measurements
        // (r14 advisor): keeping only the burst-slow first value
        // would commit a degraded reference and loosen every future
        // gate by the burst factor — the mirror image of the
        // best-of-two upward bias the r13 fix removed.
        val best =
          if (first * s < r) {
            val retry = canaryRps(spark, sfDir, name, rows)
            measured(s"canary_${tier}_rps") = (first + retry) / 2.0
            math.max(first, retry)
          } else first
        if (best * s < r)
          Some(s"""{"metric":"total","value":-1.0,"unit":"sec","degraded":true,"canary":"$tier","canary_rows_per_sec":${fmt(best, "%.0f")},"record_rows_per_sec":${fmt(r, "%.0f")},"sf":"$sfDir","note":"host contended - $tier canary >${s}x below the committed record; no record minted"}""")
        else None
      }
    }.nextOption()
  }

  /** Per-tier gate slack — calibrated to each canary's own same-box
    * measurement noise (rationale at [[runGate]]); shared by the start
    * gate and the end-of-suite suspect verdict so one tier can never
    * gate and adjudicate at different tolerances. */
  private[graft] val tierSlack =
    Map("q1" -> 1.5, "docs" -> 1.5, "emb" -> 2.25, "shuffle" -> 2.0)

  /** The four canary tiers: (tier, query, rows scanned, record ref). */
  private def tierChecks(liRows: Long, docRows: Long, embRows: Long,
                         record: Map[String, Double])
      : Seq[(String, String, Long, Option[Double])] = Seq(
    ("q1", "q1_pricing_summary", liRows,
      record.get("canary_q1_rps").orElse(record.get("q1_rows_per_sec"))),
    ("docs", "d2_minhash_sigs_xxh64", docRows,
      record.get("canary_docs_rps").orElse(record.get("docs_rows_per_sec"))),
    ("emb", "y14_sq8_topk", embRows,
      record.get("canary_emb_rps").orElse(record.get("emb_rows_per_sec"))),
    ("shuffle", "q_cube", liRows, record.get("canary_shuffle_rps")))

  /** One canary measurement: untimed JIT warmup, then median-of-3
    * rows/s — the same estimator at the start gate and the end-of-suite
    * re-measure, so their ratio prices contention, not estimator
    * drift. */
  private def canaryRps(spark: SparkSession, sfDir: String,
                        name: String, rows: Long): Double = {
    val q = SparkEntry.queries.getOrElse(name, SparkEntry.prodVariants(name))
    q(spark, sfDir).write.format("noop").mode("overwrite").save() // JIT warmup, untimed
    val times = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      q(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    rows / times.sorted.apply(1)
  }

  /** The end-of-suite suspect verdict, pure and spec-testable: a minted
    * record is SUSPECT when (a) any tier's end-of-suite canary fell
    * more than that tier's slack below its own start-of-run value —
    * contention arrived mid-suite, the exact blind spot of a
    * start-only gate — or (b) healing widened medians on more than 10%
    * of the oracle registry's QUERIES (min 8; `healedQueries` counts
    * distinct healed queries, not extra reps — the r15 advisor caught
    * the rep counter silently shifting the threshold with
    * SPARK_GRAFT_HEAL_REPS): either the host was contended on rows no
    * canary shapes, or the prev record being healed against was itself
    * garbage; in both cases the medians are not record-grade — or
    * (c) more than 5% of the registry's rows (min 2) landed over 2×
    * their committed-record medians (`inflatedRows`, the per-row
    * conviction): the r15 driver window inflated individual rows 2.3×
    * while every bracketing canary stayed inside its tier slack —
    * per-tier slack is necessarily wide, and only the row-level
    * comparison against the record sees that shape. Tiers missing from
    * either map (partial replica dirs, records predating a canary)
    * contribute nothing — absence of evidence never acquits OR
    * convicts; likewise rows absent from the prev record never count
    * as inflated. */
  private[graft] def suspectEnd(start: Map[String, Double],
                                end: Map[String, Double],
                                healedQueries: Int, nOracle: Int,
                                inflatedRows: Int = 0): Boolean = {
    val degradedTier = end.exists { case (tier, e) =>
      e > 0 && start.get(tier).exists(s =>
        s / e > tierSlack.getOrElse(tier, 1.5))
    }
    degradedTier ||
      healedQueries > math.max(8, (0.1 * nOracle).toInt) ||
      inflatedRows > math.max(2, (0.05 * nOracle).toInt)
  }

  private def writeFile(path: String, text: String): Unit = {
    val w = new java.io.PrintWriter(new java.io.File(path), "UTF-8")
    try w.write(text) finally w.close()
  }

  /** The committed record's summary section — ONLY the prefix before
    * the "queries" map is parsed, per the key-order contract at the
    * writer, so a query named e.g. `sf` or a nested "q1_rows_per_sec"
    * inside prev_delta can never mis-bind a gate value. Empty map when
    * no record exists or it was minted at a different scale factor. */
  private def recordCanaries(sfDir: String): Map[String, Double] = {
    val f = new java.io.File("BENCH_FULL.json")
    if (!f.isFile) Map.empty
    else parseCanaries(scala.io.Source.fromFile(f, "UTF-8").mkString, sfDir)
  }

  /** Pure parsing half of [[recordCanaries]], spec-testable: reads the
    * gate keys ONLY from the summary prefix before the "queries" map
    * (the writer's key-order contract), so a query named like a gate
    * key or a nested prev_delta entry can never shadow a record value;
    * returns empty for a record minted at a different scale factor. */
  private[graft] def parseCanaries(text: String,
                                   sfDir: String): Map[String, Double] = {
    val head = text.indexOf("\"queries\":") match {
      case -1 => text
      case i  => text.substring(0, i)
    }
    val sameSf = """"sf":"([^"]+)"""".r.findFirstMatchIn(head)
      .exists(_.group(1) == sfDir)
    if (!sameSf) Map.empty
    else Seq("q1_rows_per_sec", "docs_rows_per_sec", "emb_rows_per_sec",
             "canary_q1_rps", "canary_docs_rps", "canary_emb_rps",
             "canary_shuffle_rps")
      .flatMap { k =>
        (s""""$k":(\\d+(\\.\\d+)?)""").r.findFirstMatchIn(head)
          .map(m => k -> m.group(1).toDouble)
      }.toMap
  }

  /** The previous record's per-query seconds map: BENCH_FULL.json
    * (written by every Bench run and committed each round) or, when
    * that file doesn't exist yet, the latest driver-written
    * BENCH_r{N}.json tail. Used both for the self-healing re-run
    * trigger and the prev_delta trend line — and therefore SF-GATED: a
    * record minted at a different scale factor returns the empty map
    * (an sf0.1 record would otherwise trigger spurious healing reps on
    * every query of an sf0.001 dev drive). A record with no "sf" key
    * is kept, conservatively. */
  private def loadPrevMap(sfDir: String): Map[String, Double] = prevSource.fold(
    Map.empty[String, Double]) { case (_, file) =>
    parsePrevMap(scala.io.Source.fromFile(file, "UTF-8").mkString, sfDir)
  }

  /** Pure parsing half of [[loadPrevMap]], spec-testable. */
  private[graft] def parsePrevMap(raw: String,
                                  sfDir: String): Map[String, Double] = {
    // the driver may embed the bench line inside a log-tail string
    // with escaped quotes — unescape so the queries map matches either
    // way
    val text = raw.replace("\\\"", "\"")
    val sfMismatch = """"sf":"([^"]+)"""".r.findFirstMatchIn(text)
      .exists(_.group(1) != sfDir)
    // the queries map is flat "name":secs — extract pairs by regex so
    // no JSON dependency is needed
    val pairRe = """"([a-z0-9_]+)":(-?\d+\.?\d*)""".r
    val inQueries = text.indexOf("\"queries\":")
    if (sfMismatch || inQueries < 0) Map.empty
    else {
      val tail = text.substring(inQueries)
      val end = tail.indexOf('}')
      pairRe.findAllMatchIn(tail.substring(0, math.max(end, 0)))
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
    }
  }

  private def prevSource: Option[(Int, java.io.File)] = {
    val benchRe = """BENCH_r(\d+)\.json""".r
    val full = new java.io.File("BENCH_FULL.json")
    if (full.isFile) Some(0 -> full)
    else Option(new java.io.File(".").listFiles()).toSeq.flatten
      .flatMap(f => f.getName match {
        case benchRe(n) => Some(n.toInt -> f)
        case _ => None
      }).sortBy(_._1).lastOption
  }

  /** Per-query regression signal: seconds vs the previous run's full
    * map. Emits `"prev_round":N,"prev_delta":{q:cur-prev,...}` or
    * nothing when no prior record exists. Deltas only cover queries
    * present in both. */
  private def prevDelta(results: Seq[(String, Double)],
                        prev: Map[String, Double]): String = {
    val deltas = results.collect {
      case (name, cur) if cur >= 0 && prev.get(name).exists(_ >= 0) =>
        "\"" + name + "\":" + fmt3(cur - prev(name))
    }
    val src = prevSource.map { case (round, _) =>
      if (round == 0) "\"BENCH_FULL.json\"" else round.toString
    }.getOrElse("null")
    if (deltas.isEmpty) ""
    else s""","prev_round":$src,"prev_delta":${deltas.mkString("{", ",", "}")}"""
  }
}
