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
    // untimed: the on-disk fixtures some registered queries READ (the
    // t6/t7/t8 upsert tables) are built here so the measured window
    // prices the read only — the fixture write is ProbeMor's job.
    // Gated on the request: a single-query dev iteration (explicit
    // args touching none of t6/t7/t8) must not pay three table builds.
    val needsFixtures = args.isEmpty ||
      args.exists(Set("t6_upsert_apply", "t7_upsert_asof",
        "t8_upsert_changefeed"))
    if (needsFixtures) SparkEntry.prepareFixtures(spark, sfDir)
    val liRows = spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    // ---- canary gate (r9/r10 ask): a contended host has produced and
    // COMMITTED bench artifacts up to 28x off the engine's real numbers.
    // Before a FULL-suite run (args empty — the only shape that mints a
    // record), q1 (pure scan+agg, the IO-bound shape) is timed
    // median-of-3; if its rows/s is >1.5x below the committed record's
    // canary (BENCH_FULL.json), the run refuses to mint: it prints a
    // one-line JSON with "degraded":true and exits nonzero so no
    // harness can silently archive a garbage artifact. The record's
    // canary only applies at ITS scale factor (q1 rows/s at sf0.001 is
    // fixed-overhead-dominated and would spuriously trip a gate sized
    // at sf0.1), so the gate requires the record's "sf" to match.
    // SPARK_GRAFT_CANARY=off skips the gate for deliberate debugging
    // on a box known to be busy.
    val canaryRecord: Option[Double] = {
      val f = new java.io.File("BENCH_FULL.json")
      if (!f.isFile) None
      else {
        val text = scala.io.Source.fromFile(f, "UTF-8").mkString
        val sameSf = """"sf":"([^"]+)"""".r.findFirstMatchIn(text)
          .exists(_.group(1) == sfDir)
        if (!sameSf) None
        else """"q1_rows_per_sec":(\d+(\.\d+)?)""".r
          .findFirstMatchIn(text).map(_.group(1).toDouble)
      }
    }
    if (args.isEmpty &&
        sys.env.getOrElse("SPARK_GRAFT_CANARY", "on") != "off") {
      canaryRecord.filter(_ > 0).foreach { record =>
        val q1 = SparkEntry.queries("q1_pricing_summary")
        val times = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          q1(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        val rps = liRows / times.sorted.apply(1)
        if (rps * 1.5 < record) {
          println(s"""{"metric":"total","value":-1.0,"unit":"sec","degraded":true,"canary_rows_per_sec":${fmt(rps, "%.0f")},"record_rows_per_sec":${fmt(record, "%.0f")},"sf":"$sfDir","note":"host contended - q1 canary >1.5x below the committed record; no record minted"}""")
          spark.stop()
          sys.exit(3)
        }
      }
    }
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
    val results = wanted.map { case (name, fn) =>
      val times = (1 to reps).flatMap { _ =>
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
      // failed queries report -1 so they're distinguishable in the JSON
      name -> (if (times.isEmpty) -1.0 else times.sorted.apply(times.size / 2))
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
    // headline throughput: lineitem rows scanned per second on the
    // pricing-summary scan (pure scan+agg, the IO-bound shape)
    val q1Sec = results.toMap.getOrElse("q1_pricing_summary", -1.0)
    val rps = if (q1Sec > 0) liRows / q1Sec else 0.0
    val trend = prevDelta(results)
    val summary = s""""unit":"sec","sf":"$sfDir","lineitem_rows":$liRows,"q1_rows_per_sec":${fmt(rps, "%.0f")},"prod_variants_total":${fmt3(prodTotal)}"""
    val fullLine =
      s"""{"metric":"total","value":${fmt3(total)},$summary,"queries":$qs$trend}"""
    // The gate harness stores only the LAST ~2000 chars of stdout, and
    // the full per-query map alone exceeds that — so the complete record
    // goes to a FILE (committed into the repo each round) and the final
    // printed line is a budget-aware compact twin: heaviest queries
    // first, rows added until the line is guaranteed to survive the tail
    // capture intact, with an explicit count of what was elided.
    writeFile("BENCH_FULL.json", fullLine + "\n")
    println(fullLine) // head may be clipped by the tail capture; the file has it all
    val byCost = results.sortBy { case (_, v) => -v }
      .map { case (k, v) => "\"" + k + "\":" + fmt3(v) }
    val budget = 1500 // chars available for rows in the compact line
    val kept = scala.collection.mutable.ArrayBuffer.empty[String]
    var used = 0
    byCost.foreach { row =>
      if (used + row.length + 1 <= budget) { kept += row; used += row.length + 1 }
    }
    val omitted = byCost.length - kept.length
    println(s"""{"metric":"total","value":${fmt3(total)},$summary,"n_queries":${byCost.length},"queries_omitted_here":$omitted,"full_map":"BENCH_FULL.json","queries":${kept.mkString("{", ",", "}")}}""")
    spark.stop()
  }

  /** Locale-pinned number formatting for every JSON-bound value: the
    * `f` interpolator formats with the JVM default locale, and a
    * comma-decimal locale would make the emitted line invalid JSON. */
  private[graft] def fmt(v: Double, pattern: String): String =
    String.format(java.util.Locale.ROOT, pattern, Double.box(v))
  private[graft] def fmt3(v: Double): String = fmt(v, "%.3f")

  private def writeFile(path: String, text: String): Unit = {
    val w = new java.io.PrintWriter(new java.io.File(path), "UTF-8")
    try w.write(text) finally w.close()
  }

  /** Per-query regression signal: seconds vs the previous run's full map
    * (BENCH_FULL.json, written by every Bench run and committed each
    * round) or, when that file doesn't exist yet, the latest
    * driver-written BENCH_r{N}.json tail. Emits
    * `"prev_round":N,"prev_delta":{q:cur-prev,...}` or nothing when no
    * prior record exists. Deltas only cover queries present in both. */
  private def prevDelta(results: Seq[(String, Double)]): String = {
    val benchRe = """BENCH_r(\d+)\.json""".r
    val full = new java.io.File("BENCH_FULL.json")
    val prior =
      if (full.isFile) Some(0 -> full)
      else Option(new java.io.File(".").listFiles()).toSeq.flatten
        .flatMap(f => f.getName match {
          case benchRe(n) => Some(n.toInt -> f)
          case _ => None
        }).sortBy(_._1).lastOption
    prior.fold("") { case (round, file) =>
      // the driver may embed the bench line inside a log-tail string
      // with escaped quotes — unescape so the queries map matches either
      // way
      val text = scala.io.Source.fromFile(file, "UTF-8").mkString
        .replace("\\\"", "\"")
      // the queries map is flat "name":secs — extract pairs by regex so
      // no JSON dependency is needed
      val pairRe = """"([a-z0-9_]+)":(-?\d+\.?\d*)""".r
      val inQueries = text.indexOf("\"queries\":")
      val prev: Map[String, Double] =
        if (inQueries < 0) Map.empty
        else {
          val tail = text.substring(inQueries)
          val end = tail.indexOf('}')
          pairRe.findAllMatchIn(tail.substring(0, math.max(end, 0)))
            .map(m => m.group(1) -> m.group(2).toDouble).toMap
        }
      val deltas = results.collect {
        case (name, cur) if cur >= 0 && prev.get(name).exists(_ >= 0) =>
          "\"" + name + "\":" + fmt3(cur - prev(name))
      }
      val src = if (round == 0) "\"BENCH_FULL.json\"" else round.toString
      if (deltas.isEmpty) ""
      else s""","prev_round":$src,"prev_delta":${deltas.mkString("{", ",", "}")}"""
    }
  }
}
