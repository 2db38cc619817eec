package graft

import graft.ext.Quality
import graft.queries.QualityQueries
import graft.sources.Tables
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The data-quality tier (ext/Quality): one-pass profiling, integer
  * verdict math, the violations/profile reconciliation, and the
  * streaming observe() face. */
class QualitySpec extends SparkTestBase {
  import spark.implicits._

  private def docs = Tables(spark, sf()).documents
  private val checks = QualityQueries.docChecks

  test("the whole check set costs ONE scan of the table") {
    def scans(df: org.apache.spark.sql.DataFrame) =
      "Scan parquet".r.findAllIn(
        df.queryExecution.executedPlan.toString).size
    assert(scans(Quality.profile(docs, checks)) === 1,
      "N checks must compile into one pass")
    // the grouped form too: same aggs under a groupBy, still one scan
    assert(scans(Quality.profileBy(docs, Seq("source"), checks)) === 1,
      "the grouped report must not add a scan")
  }

  test("verdict math is integer per-mille, reconciled against hand counts") {
    val report = Quality.profile(docs, checks)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))).toMap
    val total = docs.count()
    // complete(text): no nulls in the synthetic corpus — ok == total, pass
    val (_, okC, totC, passC) = report(("complete", "text"))
    assert(okC === total && totC === total && passC)
    // unique(doc_id): primary key — distinct == total
    val (_, okU, _, passU) = report(("unique", "doc_id"))
    assert(okU === total && passU)
    // in_set(lang): zh is excluded from the allowed set, so ok < total,
    // and the 900 per-mille gate decides by INTEGER comparison
    val (mpmS, okS, totS, passS) = report(("in_set", "lang"))
    val handOk = docs.filter(col("lang").isin("en", "es", "de", "fr")).count()
    assert(okS === handOk && okS < totS)
    assert(passS === (okS * 1000 >= mpmS * totS),
      "pass must be the integer per-mille comparison, nothing else")
    // bounds(n_chars): hand count again — the report is just counts
    val (_, okB, _, _) = report(("bounds", "n_chars"))
    assert(okB === docs.filter(col("n_chars").between(1, 500)).count())
  }

  test("violations reconcile with the profile: misses per check match total - ok") {
    val report = Quality.profile(docs, checks)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(3), r.getLong(4))).toMap
    val v = Quality.violations(docs, checks, Seq("doc_id"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    // every row-level check's miss count equals its profile complement
    for (c <- checks if c.rowLevel.nonEmpty) {
      val (ok, total) = report((c.kind, c.column))
      val label = s"${c.kind}(${c.column})"
      val misses = v.count(_._2.split(',').contains(label))
      assert(misses === total - ok,
        s"$label: quarantine says $misses, profile says ${total - ok}")
    }
    // reasons are sorted and deduplicated by construction
    assert(v.forall { case (_, rs) =>
      val parts = rs.split(',').toSeq
      parts == parts.sorted && parts.distinct == parts
    })
  }

  test("grouped report: per-source verdicts use per-source totals and sum to the global row") {
    val bySource = Quality.profileBy(docs, Seq("source"), checks).collect()
    val global = Quality.profile(docs, checks)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(3), r.getLong(4))).toMap
    val nSources = docs.select("source").distinct().count()
    assert(bySource.length === nSources * checks.size)
    // counting checks (everything except unique) slice the global row
    // exactly; unique is NOT additive across groups (a value can repeat
    // across sources) and only bounds it from above
    for (((kind, cn), (okG, totG)) <- global) {
      val grp = bySource.filter(r =>
        r.getString(1) == kind && r.getString(2) == cn)
      val (okSum, totSum) = (grp.map(_.getLong(4)).sum, grp.map(_.getLong(5)).sum)
      assert(totSum === totG, s"$kind($cn): group totals must partition")
      if (kind == "unique") assert(okSum >= okG)
      else assert(okSum === okG, s"$kind($cn): group oks must partition")
    }
    // and each group's pass is its OWN per-mille verdict
    assert(bySource.forall(r =>
      r.getBoolean(6) == (r.getLong(4) * 1000 >= r.getLong(3) * r.getLong(5))))
  }

  test("the quarantine feed is a pure projection: no shuffle, no aggregation") {
    val plan = Quality.violations(docs, checks, Seq("doc_id"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "violations must not shuffle")
    assert(!plan.contains("HashAggregate"), "violations must not aggregate")
  }

  test("gated write: one job materializes both splits; readers partition-prune") {
    val path = java.nio.file.Files
      .createTempDirectory("graft-dq-gate").toString + "/corpus"
    Quality.writeGated(docs, checks, path)
    val clean = Quality.readClean(spark, path)
    val quarantine = Quality.readQuarantine(spark, path)
    // the split is exactly the violations partition
    val nViol = Quality.violations(docs, checks, Seq("doc_id")).count()
    assert(quarantine.count() === nViol)
    assert(clean.count() === docs.count() - nViol)
    // quarantined rows are precisely the ones with a violation reason
    val vIds = Quality.violations(docs, checks, Seq("doc_id"))
      .select("doc_id").as[Long].collect().toSet
    assert(quarantine.select("doc_id").as[Long].collect().toSet === vIds)
    // the clean reader prunes to its partition — the quarantine dir is
    // never listed into the scan
    val plan = clean.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
        "PartitionFilters:[^\\]]*dq#\\d+ = clean".r.findFirstIn(plan).nonEmpty,
      s"clean read must partition-prune on dq:\n$plan")
  }

  test("vector checks: dims/finite/norm verdicts reconcile; poisoned rows fail the right checks") {
    import graft.queries.QualityQueries.vecChecks
    val emb = Tables(spark, sf()).embeddings
    val report = Quality.profile(emb, vecChecks)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(3), r.getLong(4))).toMap
    val total = emb.count()
    // the synthetic vectors are 64-dim, finite, unique-keyed
    assert(report(("vec_dims", "embedding")) === ((total, total)))
    assert(report(("vec_finite", "embedding")) === ((total, total)))
    assert(report(("unique", "vec_id")) === ((total, total)))
    // the 1e12 norm cap splits the corpus for real (mixed verdict)
    val (okN, _) = report(("vec_norm", "embedding"))
    assert(okN > 0 && okN < total, s"norm check must mix, got $okN/$total")
    // poison two rows: wrong dims, and a NaN component — each fails
    // exactly its own check
    val poisoned = emb.limit(2).select(col("vec_id") + 100000L,
        when(col("vec_id") % 2 === 0, slice(col("embedding"), 1, 3))
          .otherwise(concat(slice(col("embedding"), 1, 63),
            array(lit(Float.NaN)))).as("embedding"))
      .toDF("vec_id", "embedding")
    val v = Quality.violations(poisoned, vecChecks, Seq("vec_id"))
      .collect().map(r => r.getString(1))
    assert(v.length === 2)
    assert(v.exists(_.contains("vec_dims(embedding)")))
    assert(v.exists(_.contains("vec_finite(embedding)")))
  }

  test("vecNormQ is null/NaN-safe: dirty vectors FAIL instead of crashing the pass") {
    // 1: exact unit norm (snapped 600000²+800000² = 1e12) → pass;
    // 2: NaN component; 3: null array; 4: norm out of bounds;
    // 5: null component (pre-fix this crashed SnapVecLong)
    val vecs = spark.sql(
      """SELECT * FROM VALUES
        |  (1L, array(CAST(0.6 AS FLOAT), CAST(0.8 AS FLOAT))),
        |  (2L, array(CAST(1.0 AS FLOAT), CAST('NaN' AS FLOAT))),
        |  (3L, CAST(NULL AS ARRAY<FLOAT>)),
        |  (4L, array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))),
        |  (5L, array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)))
        |AS t(vec_id, embedding)""".stripMargin)
    val checkSet = Seq(
      Quality.vecNormQ("embedding", 999000000000L, 1000000000000L))
    val rep = Quality.profile(vecs, checkSet).collect().head
    assert(rep.getLong(3) === 1L && rep.getLong(4) === 5L,
      "only the clean unit vector may pass; dirty rows count as failures")
    // the row-level form quarantines the dirty rows rather than crashing
    val v = Quality.violations(vecs, checkSet, Seq("vec_id"))
      .collect().map(_.getLong(0)).toSet
    assert(v === Set(2L, 3L, 4L, 5L))
  }

  test("oracle assembly: quoted regexes escape; non-identifier columns are rejected") {
    val c = Quality.matches("lang", "^[a-z']+$")
    assert(c.sql.contains("'^[a-z'']+$'"),
      "a single quote in the regex must be '' -escaped in the SQL twin")
    intercept[IllegalArgumentException] { Quality.complete("bad name") }
    intercept[IllegalArgumentException] { Quality.complete("x; DROP") }
  }

  test("drift surfaces a check present in only ONE snapshot as drifted, not dropped") {
    val cur = Quality.profile(docs, checks)
    val refChecks = checks :+ Quality.minLength("lang", 2)
    val ref = Quality.profile(docs, refChecks)
    val d = Quality.drift(cur, ref, 10).collect()
    assert(d.length === refChecks.size, "one-sided checks must not vanish")
    val row = d.find(r => r.getString(0) == "min_length" &&
      r.getString(1) == "lang").getOrElse(fail("one-sided row dropped"))
    assert(row.isNullAt(2) && !row.isNullAt(3),
      "cur_pm null (missing side), ref_pm present")
    assert(row.isNullAt(4) && row.getBoolean(5),
      "drift_pm null, drifted=true — appearance IS drift")
  }

  test("drift: identical snapshots report zero; a shifted one trips exactly the moved checks") {
    val prof = Quality.profile(docs, checks)
    // self-drift is identically zero at any tolerance
    val self = Quality.drift(prof, prof, 0).collect()
    assert(self.nonEmpty && self.forall(r =>
      r.getLong(4) === 0L && !r.getBoolean(5)))
    // shift the distribution: drop every zh doc from the current side —
    // in_set(lang) must drift (zh was failing it); complete(text) must not
    val cur = Quality.profile(docs.filter(col("lang") =!= "zh"), checks)
    val d = Quality.drift(cur, prof, 10)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(4), r.getBoolean(5))).toMap
    assert(d(("in_set", "lang"))._2, "removing zh must trip the in_set gate")
    assert(d(("complete", "text")) === ((0L, false)),
      "an unmoved metric must not drift")
  }

  test("composition: quality counters ride the upsert CDC subscription per delta batch") {
    // the operational loop: a table's change feed is SUBSCRIBED
    // (StreamUpsert.feed) and every incoming delta batch reports its
    // own data health through the free observe() counters — the
    // validation a replica runs BEFORE applying upstream changes.
    import graft.ext.Upsert
    val p = java.nio.file.Files
      .createTempDirectory("graft-dq-feed").toString + "/t"
    Upsert.init(Seq((1L, 0L, "seed")).toDF("k", "ts", "v"),
      p, "k", Seq("ts"), 4)
    Upsert.appendChanges(spark, p,
      Seq((2L, 1L, "ok", "U"), (3L, 1L, null.asInstanceOf[String], "U"))
        .toDF("k", "ts", "v", "op"), deltaId = Some(0L))
    val feedChecks = Seq(Quality.complete("v"),
      Quality.inSet("op", Seq("U", "D")))
    val gated = Quality.observed(
      graft.streaming.StreamUpsert.feed(spark, p), feedChecks, "feed_dq")
    val q = gated.writeStream.format("noop").start()
    try {
      q.processAllAvailable()
      val m = q.recentProgress.flatMap(pr =>
          Option(pr.observedMetrics.get("feed_dq")))
        .lastOption.getOrElse(fail("no feed_dq metrics"))
      assert(m.getAs[Long]("total") === 2L)
      assert(m.getAs[Long]("ok_complete_v") === 1L,
        "the null-payload change must be counted out by the feed gate")
      assert(m.getAs[Long]("ok_in_set_op") === 2L)
    } finally q.stop()
  }

  test("streaming gated split equals the batch writeGated split, exactly-once roots") {
    implicit val sq = spark.sqlContext
    val base = java.nio.file.Files
      .createTempDirectory("graft-dq-sgate").toString
    val rows = docs.select(col("doc_id"), col("text"), col("lang"),
        col("n_chars")).as[(Long, String, String, Long)].collect().toSeq
    val mem = MemoryStream[(Long, String, String, Long)]
    val ckpt = s"$base/ckpt"
    val q = mem.toDF().toDF("doc_id", "text", "lang", "n_chars")
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch(graft.streaming.StreamQuality.gatedApplier(
        checks, s"$base/clean", s"$base/quarantine", ckpt))
      .start()
    try {
      val (a, b) = rows.splitAt(rows.size / 2)
      mem.addData(a: _*); q.processAllAvailable()
      mem.addData(b: _*); q.processAllAvailable()
    } finally q.stop()
    val clean = graft.streaming.StreamSink
      .readCommitted(spark, s"$base/clean").drop("batch")
    val quarantine = graft.streaming.StreamSink
      .readCommitted(spark, s"$base/quarantine").drop("batch")
    // the stream's split == the batch gate's split over the same rows
    // (the batch form runs on the 4-column projection the stream saw)
    val gatePath = s"$base/batch-gate"
    Quality.writeGated(docs.select(col("doc_id"), col("text"), col("lang"),
      col("n_chars")), checks, gatePath)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").as[Long].collect().toSet
    assert(ids(clean) === ids(Quality.readClean(spark, gatePath)))
    assert(ids(quarantine) === ids(Quality.readQuarantine(spark, gatePath)))
    assert(clean.count() + quarantine.count() === rows.size.toLong)
  }

  test("observed(): the same row-level counters ride a stream for free") {
    implicit val sq = spark.sqlContext
    val rows = docs.select(col("doc_id"), col("text"), col("lang"),
        col("n_chars"))
      .as[(Long, String, String, Long)].collect().toSeq
    val mem = MemoryStream[(Long, String, String, Long)]
    val observedDf = Quality.observed(
      mem.toDF().toDF("doc_id", "text", "lang", "n_chars"), checks)
    val q = observedDf.writeStream.format("noop").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      // per-micro-batch channel: the progress event's observedMetrics
      val m = q.recentProgress.flatMap(p =>
          Option(p.observedMetrics.get("dq")))
        .lastOption.getOrElse(fail("no dq metrics in any progress event"))
      assert(m.getAs[Long]("total") === rows.size.toLong)
      // cross-check two counters against the batch profile
      val report = Quality.profile(docs, checks)
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(3))
        .toMap
      assert(m.getAs[Long]("ok_in_set_lang") === report(("in_set", "lang")))
      assert(m.getAs[Long]("ok_min_length_text") === report(("min_length", "text")))
    } finally q.stop()
  }
}
