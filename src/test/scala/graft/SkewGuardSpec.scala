package graft

import graft.ext.{Dedup, SkewGuard}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** The 100 TB boilerplate scenario the synthetic fixtures never
  * manufacture: one corpus-sized LSH bucket. Asserts the df-cap guard
  * bounds per-task join input, preserves sub-cap pairs, reports what it
  * dropped, and is EXACTLY the unguarded join when the cap is off or
  * above the corpus's largest bucket (the oracle-parity guarantee for
  * d3/d5, which run with the cap off). */
class SkewGuardSpec extends SparkTestBase {
  import spark.implicits._

  /** 200 docs of IDENTICAL boilerplate (one 200-doc bucket in EVERY
    * band — the adversarial hot bucket) + 3 true near-dup pairs with
    * pair-unique text + 50 unique-text docs. */
  private lazy val fixture: DataFrame = {
    val boiler = (0L until 200L).map(i =>
      (i, "breaking news subscribe to our newsletter terms of service apply " +
        "all rights reserved copyright notice cookie policy accepted here"))
    val pairs = (0 until 3).flatMap { p =>
      val base = s"pair$p document about topic$p with many shared words " +
        s"alpha$p beta$p gamma$p delta$p epsilon$p zeta$p eta$p theta$p"
      Seq((1000L + 2 * p, base), (1000L + 2 * p + 1, base))
    }
    val unique = (0 until 50).map(i =>
      (2000L + i, s"unique$i totally distinct content id$i " +
        (0 until 10).map(j => s"w${i}_$j").mkString(" ")))
    (boiler ++ pairs ++ unique).toDF("doc_id", "text")
  }

  private def bands(sigs: DataFrame): DataFrame =
    sigs.select(col("doc_id"),
      posexplode(array(col("band0"), col("band1"))).as(Seq("band_idx", "band_hash")))

  test("capBuckets bounds bucket occupancy and hotBuckets reports exactly the dropped tail") {
    val sigs = Dedup.minhashSignatures(fixture).persist()
    val b = bands(sigs)
    val capped = SkewGuard.capBuckets(b, Seq("band_idx", "band_hash"), 10)
    val maxOcc = capped.groupBy(col("band_idx"), col("band_hash"))
      .agg(count(lit(1)).as("n")).agg(max(col("n"))).as[Long].head()
    assert(maxOcc <= 10, s"guarded frame still has a bucket of $maxOcc")
    // the boilerplate collides in both bands: exactly 2 hot buckets of 200
    val hot = SkewGuard.hotBuckets(b, Seq("band_idx", "band_hash"), 10)
      .select(col("bucket_n")).as[Long].collect().toSeq
    assert(hot === Seq(200L, 200L))
    sigs.unpersist()
  }

  test("guarded candidate join keeps every sub-cap pair, drops only hot-bucket-internal ones") {
    val sigs = Dedup.minhashSignatures(fixture).persist()
    val unguarded = Dedup.candidatePairs(sigs)
      .as[(Long, Long)].collect().toSet
    val guarded = Dedup.candidatePairs(sigs, maxBucket = 10)
      .as[(Long, Long)].collect().toSet
    // the hot bucket contributed its full quadratic candidate set
    assert(unguarded.size >= 200 * 199 / 2)
    // guard: the 3 true pairs survive (their buckets have occupancy 2)
    val truePairs = (0 until 3).map(p => (1000L + 2 * p, 1000L + 2 * p + 1)).toSet
    assert(truePairs.subsetOf(guarded))
    // every guarded pair was also an unguarded candidate, and nothing
    // outside the boilerplate block was lost
    assert(guarded.subsetOf(unguarded))
    val boilerIds = (0L until 200L).toSet
    val lost = unguarded -- guarded
    assert(lost.forall { case (a, b) => boilerIds(a) && boilerIds(b) },
      "guard must only drop pairs whose every collision is hot")
    // end-to-end: the verify stage over guarded candidates completes and
    // confirms exactly the true near-dup pairs
    val verified = Dedup.verifyJaccard(fixture,
        Dedup.candidatePairs(sigs, maxBucket = 10), 0.8)
      .select(col("a_id"), col("b_id")).as[(Long, Long)].collect().toSet
    assert(verified === truePairs)
    sigs.unpersist()
  }

  test("cap off or above the largest bucket is EXACTLY the unguarded join (d3/d5 parity)") {
    val sigs = Dedup.minhashSignatures(fixture).persist()
    val unguarded = Dedup.candidatePairs(sigs).as[(Long, Long)].collect().toSet
    val wideCap = Dedup.candidatePairs(sigs, maxBucket = 1000)
      .as[(Long, Long)].collect().toSet
    assert(wideCap === unguarded)
    sigs.unpersist()
  }

  test("simhash band pairs honor the cap with the same contract") {
    val toks = fixture.select(col("doc_id"),
      explode(array_distinct(split(col("text"), "\\s+"))).as("t"))
    val sim = Dedup.simhash(toks).persist()
    val unguarded = Dedup.simhashBandPairs(sim)
      .select(col("a_id"), col("b_id")).as[(Long, Long)].collect().toSet
    val guarded = Dedup.simhashBandPairs(sim, maxBucket = 10)
      .select(col("a_id"), col("b_id")).as[(Long, Long)].collect().toSet
    assert(guarded.subsetOf(unguarded))
    val boilerIds = (0L until 200L).toSet
    assert((unguarded -- guarded).forall { case (a, b) => boilerIds(a) && boilerIds(b) })
    // identical texts pairwise collide in every band; the guard removes
    // that block, the pair-level duplicates survive
    val truePairs = (0 until 3).map(p => (1000L + 2 * p, 1000L + 2 * p + 1)).toSet
    assert(truePairs.subsetOf(guarded))
    sim.unpersist()
  }

  test("incremental near-dup caps the INDEX's posting lists with the same contract") {
    // index = boilerplate block + one true partner + unique docs;
    // batch = one boilerplate doc + the other true partner
    val indexDocs = fixture.filter(col("doc_id") =!= 0L && col("doc_id") =!= 1000L)
    val batchDocs = fixture.filter(col("doc_id") === 0L || col("doc_id") === 1000L)
    val idx = java.nio.file.Files.createTempDirectory("graft-skew-idx").toString
    Dedup.writeNeardupIndex(indexDocs, idx)
    def screen(cap: Int) =
      Dedup.incrementalNeardup(spark, batchDocs, idx, 0.8, maxBucket = cap)
        .select(col("batch_id"), col("corpus_id"))
        .as[(Long, Long)].collect().toSet
    val unguarded = screen(0)
    // doc 0 matches all 199 indexed boilerplate copies; doc 1000 its pair
    assert(unguarded.size === 200)
    val guarded = screen(10)
    graft.core.CacheScope.releaseAll()
    // the boilerplate posting list (199 entries) is dropped; the true
    // pair's bucket (1 index entry) survives
    assert(guarded === Set((1000L, 1001L)))
  }

  test("the streaming ingest screen honors the cap and matches the guarded batch form") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val indexDocs = fixture.filter(col("doc_id") =!= 0L && col("doc_id") =!= 1000L)
    val batchRows = Seq(
      0L -> fixture.filter(col("doc_id") === 0L).select(col("text")).as[String].head(),
      1000L -> fixture.filter(col("doc_id") === 1000L).select(col("text")).as[String].head())
    val idx = java.nio.file.Files.createTempDirectory("graft-skew-sidx").toString
    Dedup.writeNeardupIndex(indexDocs, idx)
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = graft.streaming.StreamDedup
      .againstIndex(in.toDF().toDF("doc_id", "text"), idx, 0.8, maxBucket = 10)
      .writeStream.format("memory").queryName("skew_snd_out")
      .outputMode("append").start()
    in.addData(batchRows); q.processAllAvailable(); q.stop()
    val streamed = spark.table("skew_snd_out")
      .select(col("batch_id"), col("corpus_id")).as[(Long, Long)].collect().toSet
    assert(streamed === Set((1000L, 1001L)))
    graft.core.CacheScope.releaseAll()
  }

  test("guarded screens keep a pair whose band-0 bucket is hot but band-1 bucket is cool") {
    // the adversarial mix the text fixture can't manufacture: the TRUE
    // pair collides on BOTH bands, band 0's bucket is boilerplate-hot,
    // band 1's is cool. The guard drops the band-0 posting rows, so the
    // pair's only surviving collision is band 1 — the streaming screen's
    // carried-band-0 suppression must not kill that row (SkewGuard
    // contract: survives iff ANY sub-cap bucket collides; the batch twin
    // keeps it via distinct()). Index rows are crafted directly in the
    // index schema to pin the band values.
    val pairText = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val real = Dedup.signaturesFromShingles(
      Dedup.shingleFrame(Seq((1001L, pairText)).toDF("doc_id", "text")),
      keep = Seq("sh"))
    val hotBand0 = real.select(col("band0")).as[String].head()
    val crafted = (0 until 150).map { i =>
      (2000L + i, Seq(s"crafted$i shingle only"),
        f"$i%08x", f"$i%08x", f"$i%08x", f"$i%08x",
        hotBand0, f"band1-unique-$i%03d")
    }.toDF("doc_id", "sh", "sig0", "sig1", "sig2", "sig3", "band0", "band1")
    val idx = java.nio.file.Files.createTempDirectory("graft-skew-b0").toString
    real.unionByName(crafted).write.mode("overwrite").parquet(idx)

    val batchDocs = Seq((1000L, pairText)).toDF("doc_id", "text")
    val batch = Dedup.incrementalNeardup(spark, batchDocs, idx, 0.8, maxBucket = 10)
      .select(col("batch_id"), col("corpus_id")).as[(Long, Long)].collect().toSet
    assert(batch === Set((1000L, 1001L)), "batch twin must keep the band-1 pair")

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = graft.streaming.StreamDedup
      .againstIndex(in.toDF().toDF("doc_id", "text"), idx, 0.8, maxBucket = 10)
      .writeStream.format("memory").queryName("skew_b0_out")
      .outputMode("append").start()
    in.addData(Seq((1000L, pairText))); q.processAllAvailable(); q.stop()
    val streamed = spark.table("skew_b0_out")
      .select(col("batch_id"), col("corpus_id")).as[(Long, Long)].collect().toSet
    assert(streamed === Set((1000L, 1001L)),
      "streaming screen lost the pair whose band-0 bucket was guard-dropped")
    graft.core.CacheScope.releaseAll()
  }

  test("salt-split pairs are EXACTLY the unguarded join, with bounded sub-buckets") {
    val sigs = Dedup.minhashSignatures(fixture).persist()
    val unguarded = Dedup.candidatePairs(sigs).as[(Long, Long)].collect().toSet
    // the adversarial 200-doc bucket is present and quadratic
    assert(unguarded.size >= 200 * 199 / 2)
    val salted = Dedup.candidatePairsSalted(sigs, maxBucket = 10)
      .as[(Long, Long)].collect().toSet
    // complete recall: every unguarded pair survives, including every
    // hot-bucket-internal one the df-cap mode would drop — and nothing
    // extra appears (both orientations of the sub-bucket cross-product
    // normalize to one row)
    assert(salted === unguarded)
    // bounded per-task input: replicate the salt assignment and check no
    // (bucket, sub-bucket) group exceeds the cap by more than the hash-
    // unevenness slack (deterministic here — murmur3 over fixed ids)
    val b = bands(sigs)
    val occ = b.groupBy(col("band_idx"), col("band_hash"))
      .agg(count(lit(1)).as("n"))
    val maxSub = b.join(occ, Seq("band_idx", "band_hash"))
      .withColumn("g", floor((col("n") + lit(9)) / lit(10)).cast("long"))
      .withColumn("salt", pmod(hash(col("doc_id")), col("g")))
      .groupBy(col("band_idx"), col("band_hash"), col("salt"))
      .agg(count(lit(1)).as("sub_n"))
      .agg(max(col("sub_n"))).as[Long].head()
    assert(maxSub < 200L, "hot bucket was not split")
    assert(maxSub <= 30L, s"sub-bucket of $maxSub exceeds cap 10 + slack")
    sigs.unpersist()
  }

  test("salted verify pipeline equals the unguarded d3 pipeline end to end") {
    val sh = Dedup.shingleFrame(fixture).persist()
    val sigs = Dedup.signaturesFromShingles(sh).persist()
    val plain = Dedup.verifyJaccardOnShingles(sh, Dedup.candidatePairs(sigs), 0.8)
      .select(col("a_id"), col("b_id"), col("jaccard"))
      .as[(Long, Long, Double)].collect().toSet
    val salted = Dedup.verifyJaccardOnShingles(sh,
        Dedup.candidatePairsSalted(sigs, maxBucket = 10), 0.8)
      .select(col("a_id"), col("b_id"), col("jaccard"))
      .as[(Long, Long, Double)].collect().toSet
    assert(salted === plain)
    sigs.unpersist(); sh.unpersist()
  }

  test("write-time-capped index screened UNARMED equals the armed guard, batch and stream") {
    val indexDocs = fixture.filter(col("doc_id") =!= 0L && col("doc_id") =!= 1000L)
    val batchDocs = fixture.filter(col("doc_id") === 0L || col("doc_id") === 1000L)
    val plainIdx = java.nio.file.Files.createTempDirectory("graft-wt-plain").toString
    val cappedIdx = java.nio.file.Files.createTempDirectory("graft-wt-capped").toString
    Dedup.writeNeardupIndex(indexDocs, plainIdx)
    Dedup.writeNeardupIndex(indexDocs, cappedIdx, "text", "doc_id", 10)
    // the capped index nulls exactly the boilerplate posting lists: the
    // doc rows (and their sh) all remain
    val idxDf = spark.read.parquet(cappedIdx)
    assert(idxDf.count() === indexDocs.count())
    assert(idxDf.filter(col("band0").isNull && length(col("sig0")) > 0).count() >= 199)
    // batch twin: unarmed screen of the capped index == armed screen of
    // the plain index
    val armed = Dedup.incrementalNeardup(spark, batchDocs, plainIdx, 0.8,
        maxBucket = 10)
      .select(col("batch_id"), col("corpus_id")).as[(Long, Long)].collect().toSet
    graft.core.CacheScope.releaseAll()
    val precapped = Dedup.incrementalNeardup(spark, batchDocs, cappedIdx, 0.8)
      .select(col("batch_id"), col("corpus_id")).as[(Long, Long)].collect().toSet
    graft.core.CacheScope.releaseAll()
    assert(precapped === armed)
    assert(precapped === Set((1000L, 1001L)))
    // streaming twin, unarmed against the capped index
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val screen = graft.streaming.StreamDedup
      .againstIndex(in.toDF().toDF("doc_id", "text"), cappedIdx, 0.8)
    // the production point: the unarmed screen over a write-time-capped
    // index carries NO aggregation — nothing corpus-wide re-runs per
    // micro-batch
    val aggs = screen.queryExecution.analyzed.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }
    assert(aggs.isEmpty, s"unarmed screen should be aggregation-free: $aggs")
    val batchRows = Seq(
      0L -> fixture.filter(col("doc_id") === 0L).select(col("text")).as[String].head(),
      1000L -> fixture.filter(col("doc_id") === 1000L).select(col("text")).as[String].head())
    val q = screen.writeStream.format("memory").queryName("wt_capped_out")
      .outputMode("append").start()
    in.addData(batchRows); q.processAllAvailable(); q.stop()
    val streamed = spark.table("wt_capped_out")
      .select(col("batch_id"), col("corpus_id")).as[(Long, Long)].collect().toSet
    assert(streamed === armed)
    graft.core.CacheScope.releaseAll()
  }

  test("compaction re-caps an appended index: unarmed screen equals the armed guard") {
    // the write-time-cap caveat made operational: occupancy is measured
    // per WRITE, so an index written cool and grown hot by appends
    // carries no stored evidence of the hot bucket — compaction
    // re-measures over the index's current rows and nulls what the
    // appends made hot, with no corpus re-tokenization
    val indexDocs = fixture.filter(col("doc_id") =!= 0L && col("doc_id") =!= 1000L)
    val coolDocs = indexDocs.filter(col("doc_id") >= 1000L)   // pairs + uniques
    val boilDocs = indexDocs.filter(col("doc_id") < 1000L)    // 199 boilerplate
    val plainIdx = java.nio.file.Files.createTempDirectory("graft-cmp-plain").toString
    val grownIdx = java.nio.file.Files.createTempDirectory("graft-cmp-grown").toString
    Dedup.writeNeardupIndex(indexDocs, plainIdx)
    // grown index: written cool (every bucket <= cap), THEN the
    // boilerplate lands as appends — a write-time cap of 10 at write
    // time would have nulled nothing
    Dedup.writeNeardupIndex(coolDocs, grownIdx)
    Dedup.appendToNeardupIndex(boilDocs, grownIdx)
    Dedup.compactNeardupIndex(spark, grownIdx, maxBucket = 10)
    // every doc row (and its sh) survives; only hot band entries are nulled
    val idxDf = spark.read.parquet(grownIdx)
    assert(idxDf.count() === indexDocs.count())
    assert(idxDf.filter(col("band0").isNull && length(col("sig0")) > 0).count() >= 199)
    val batchDocs = fixture.filter(col("doc_id") === 0L || col("doc_id") === 1000L)
    val armed = Dedup.incrementalNeardup(spark, batchDocs, plainIdx, 0.8,
        maxBucket = 10)
      .select(col("batch_id"), col("corpus_id")).as[(Long, Long)].collect().toSet
    graft.core.CacheScope.releaseAll()
    val compacted = Dedup.incrementalNeardup(spark, batchDocs, grownIdx, 0.8)
      .select(col("batch_id"), col("corpus_id")).as[(Long, Long)].collect().toSet
    graft.core.CacheScope.releaseAll()
    assert(compacted === armed)
    assert(compacted === Set((1000L, 1001L)))
  }

  test("salted CROSS screen is EXACTLY the unguarded incremental screen, with bounded cells") {
    // index = 199 boilerplate + pair partner + uniques; batch = 1
    // boilerplate doc + the other partner. The unguarded screen emits
    // all 200 batch-vs-corpus pairs; the df-cap mode (tested above)
    // keeps only the cool pair — the salt mode must keep ALL 200.
    val indexDocs = fixture.filter(col("doc_id") =!= 0L && col("doc_id") =!= 1000L)
    val batchDocs = fixture.filter(col("doc_id") === 0L || col("doc_id") === 1000L)
    val idx = java.nio.file.Files.createTempDirectory("graft-xsalt-idx").toString
    Dedup.writeNeardupIndex(indexDocs, idx)
    val unguarded = Dedup.incrementalNeardup(spark, batchDocs, idx, 0.8)
      .select(col("batch_id"), col("corpus_id")).as[(Long, Long)].collect().toSet
    graft.core.CacheScope.releaseAll()
    assert(unguarded.size === 200)
    val salted = Dedup.incrementalNeardup(spark, batchDocs, idx, 0.8,
        maxBucket = 10, skewMode = "salt")
      .select(col("batch_id"), col("corpus_id")).as[(Long, Long)].collect().toSet
    graft.core.CacheScope.releaseAll()
    assert(salted === unguarded, "cross salt-split must be recall-preserving")
    // bounded per-cell input: replicate the grid assignment over the
    // generic helper on a raw keyed frame and check no (bucket, lcell,
    // rcell) group exceeds cap + hash-unevenness slack
    val left = (0L until 7L).map(i => ("hot", i)).toDF("k", "lid")
    val right = (0L until 500L).map(i => ("hot", 10000L + i)).toDF("k", "rid")
    val pairs = graft.ext.SkewGuard.saltedCrossJoinPairs(
        left, right, Seq("k"), "lid", "rid", 25)
      .as[(Long, Long)].collect().toSet
    assert(pairs.size === 7 * 500, "grid must emit the full cross product once")
    val rCells = right
      .withColumn("salt", pmod(hash(col("rid")), lit(500 / 25)))
      .groupBy(col("salt")).agg(count(lit(1)).as("n"))
      .agg(max(col("n"))).as[Long].head()
    assert(rCells <= 50L, s"right sub-bucket of $rCells exceeds cap 25 + slack")
  }

  test("the streaming salted screen matches the unguarded batch screen exactly") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val indexDocs = fixture.filter(col("doc_id") =!= 0L && col("doc_id") =!= 1000L)
    val batchDocs = fixture.filter(col("doc_id") === 0L || col("doc_id") === 1000L)
    val idx = java.nio.file.Files.createTempDirectory("graft-xsalt-sidx").toString
    Dedup.writeNeardupIndex(indexDocs, idx)
    val unguarded = Dedup.incrementalNeardup(spark, batchDocs, idx, 0.8)
      .select(col("batch_id"), col("corpus_id")).as[(Long, Long)].collect().toSet
    graft.core.CacheScope.releaseAll()
    val batchRows = batchDocs.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = graft.streaming.StreamDedup
      .againstIndex(in.toDF().toDF("doc_id", "text"), idx, 0.8,
        maxBucket = 10, skewMode = "salt")
      .writeStream.format("memory").queryName("xsalt_snd_out")
      .outputMode("append").start()
    in.addData(batchRows); q.processAllAvailable(); q.stop()
    val streamed = spark.table("xsalt_snd_out")
      .select(col("batch_id"), col("corpus_id")).as[(Long, Long)].collect().toSet
    assert(streamed === unguarded,
      "streaming salt-split must emit exactly the unguarded pair set")
    assert(streamed.size === 200)
    graft.core.CacheScope.releaseAll()
  }

  test("the incremental-labels loop under salt equals the unguarded loop (self + cross)") {
    val indexDocs = fixture.filter(col("doc_id") =!= 0L && col("doc_id") =!= 1000L)
    // batch holds an INTERNAL boilerplate pair too, so both the
    // triangular self-split and the grid cross-split arm
    val batchDocs = fixture.filter(col("doc_id") === 0L || col("doc_id") === 1L ||
      col("doc_id") === 1000L)
    val idxDocs2 = indexDocs.filter(col("doc_id") =!= 1L)
    val idx = java.nio.file.Files.createTempDirectory("graft-xsalt-lbl").toString
    Dedup.writeNeardupIndex(idxDocs2, idx)
    val labels = graft.ext.Dedup.connectedComponents(
      graft.ext.Curation.neardupPairs(idxDocs2).select(col("a_id"), col("b_id")))
    def run(cfg: graft.ext.CurationConfig) = {
      val out = graft.ext.Curation.incrementalLabels(labels, batchDocs, idx, cfg)
        .as[(Long, Long)].collect().toSet
      graft.core.CacheScope.releaseAll()
      out
    }
    val unguarded = run(graft.ext.CurationConfig())
    val salted = run(graft.ext.CurationConfig(maxBucket = 10, skewMode = "salt"))
    assert(salted === unguarded,
      "salt-armed incremental labels must equal the unguarded loop")
  }

  test("the guard's observe metric reports dropped buckets and rows") {
    val sigs = Dedup.minhashSignatures(fixture)
    val metrics = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit =
        qe.observedMetrics.foreach { case (name, row) =>
          if (name.startsWith("graft_skew_guard"))
            metrics.add((row.getLong(0), row.getLong(1)))
        }
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      SkewGuard.capBuckets(bands(sigs), Seq("band_idx", "band_hash"), 10).count()
      val deadline = System.currentTimeMillis() + 30000
      while (metrics.isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(!metrics.isEmpty, "observe metric never arrived")
      val (bucketsDropped, rowsDropped) = metrics.peek()
      assert(bucketsDropped === 2L) // the boilerplate bucket, in both bands
      assert(rowsDropped === 400L)  // 200 docs x 2 bands
    } finally spark.listenerManager.unregister(listener)
  }

  test("pre-flight occupancy refusal: hot corpus refused loud, clean corpus silent") {
    // r14 verdict #3: the unguarded fixture builders pointed at a
    // boilerplate-heavy corpus die by spill (66 GB at the zipf decade),
    // not by error — refuseHotBuckets prices the screen with one linear
    // histogram pass and names the armed recipe instead.
    val sigs = Dedup.minhashSignatures(fixture).persist()
    try {
      assert(Dedup.maxBandOccupancy(sigs) === 200L) // the boilerplate bucket
      val e = intercept[IllegalStateException] {
        Dedup.refuseHotBuckets(sigs, threshold = 100, what = "test build")
      }
      assert(e.getMessage.contains("writeNeardupIndex(maxBucket)"),
        "the refusal must point at the armed recipe")
      assert(e.getMessage.contains("200"), "and name the measured occupancy")
      // at-or-above the hottest bucket: silent (<= threshold passes)
      Dedup.refuseHotBuckets(sigs, threshold = 200, what = "test build")
      // NULL bands (shingle-less docs / write-time-capped index rows)
      // never count — they drop out of every candidate equi-join too
      val nulled = sigs.withColumn("band0", lit(null).cast("string"))
        .withColumn("band1", lit(null).cast("string"))
      assert(Dedup.maxBandOccupancy(nulled) === 0L)
      Dedup.refuseHotBuckets(nulled, threshold = 1, what = "all-null")
    } finally sigs.unpersist()
  }

  test("generalized refusal fronts the winnow, simhash, and LSH-graph screens") {
    // r15 verdict #4: the minhash fixture builders were the only
    // surfaces the pre-flight refusal fronted — the winnow fingerprint
    // self-join (d15: ~53k-row zipf bucket → ~1.4e9 pairs from one
    // bucket, previously a "NEVER time on zipf" doc rule), the simhash
    // band self-join (d5), and the kNN-graph/multiband candidate joins
    // (y6/y8-class) share the exact unguarded all-pairs-per-bucket
    // shape. refuseHotGroups prices each with one histogram pass; the
    // 200-identical-doc fixture is hot on every one of them.
    val key = "spark.graft.dedup.maxUnguardedBucket"
    // 10, not 100: the simhash surface's threshold defaults to 10x the
    // generic key (cheap xor-verify pairs — see maxUnguardedSimhashBucket),
    // so the 200-doc boilerplate bucket must clear 10*10=100 to fire it
    spark.conf.set(key, "10")
    try {
      val e1 = intercept[IllegalStateException] {
        Dedup.winnowSharedSpans(fixture, k = 3, w = 4).count()
      }
      assert(e1.getMessage.contains("winnow fingerprint"))
      intercept[IllegalStateException] {
        Dedup.winnowSpanExtents(fixture, k = 3, w = 4, minLen = 3L).count()
      }
      val toks = fixture.select(col("doc_id"),
        explode(array_distinct(split(col("text"), "\\s+"))).as("t"))
      val sim = Dedup.simhash(toks).persist()
      val e2 = intercept[IllegalStateException] {
        Dedup.simhashBandPairs(sim, maxHamming = 2).count()
      }
      assert(e2.getMessage.contains("simhash band"))
      // the ARMED forms run under the same conf — the cap bounds the
      // bucket by construction, so no pre-flight applies
      assert(Dedup.winnowSharedSpans(fixture, 3, 4, maxBucket = 5).count() >= 3L,
        "the capped winnow twin must still find the true pairs")
      assert(Dedup.simhashBandPairs(sim, 2, maxBucket = 5)
        .filter(col("a_id") >= 1000L && col("a_id") < 2000L).count() >= 3L,
        "the capped simhash twin must still find the true pairs")
      sim.unpersist()
      // the LSH-graph surfaces read real embeddings: at threshold 1
      // every multi-occupant bucket is "hot" — both refuse; at the
      // 1000 default both are silent (the registered y6/y8 rows)
      spark.conf.set(key, "1")
      val dir = sf()
      val e3 = intercept[IllegalStateException] {
        graft.queries.SimilarityQueries.knnGraph(spark, dir).count()
      }
      assert(e3.getMessage.contains("kNN-graph"))
      intercept[IllegalStateException] {
        graft.queries.SimilarityQueries
          .annLshMultiband(spark, dir).count()
      }
      spark.conf.set(key, "1000")
      assert(graft.queries.SimilarityQueries.knnGraph(spark, dir).limit(1)
        .count() >= 0L, "silent at the default threshold")
    } finally {
      spark.conf.set(key, "1000")
      graft.core.CacheScope.releaseAll()
    }
  }
}
