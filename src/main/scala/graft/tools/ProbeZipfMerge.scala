package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.Dedup

/** The zipf-decade dedup pipeline run the way PRODUCTION would run it —
  * armed screens end to end — against the r14 finding that the
  * UNGUARDED corpus-side build (the oracle-parity fixture builders:
  * plain candidatePairs for d7/idx-labels) ran >25 minutes at 500k
  * zipf docs before being killed, while the same build takes ~40 s at
  * 50k. The zipf template boilerplate (ScaleUp --zipf appends an
  * identical 15-word tail per zipf-ranked template k) is EXACTLY the
  * degenerate-boilerplate bucket class SkewGuard's drop contract names:
  * a hot band bucket whose members share only boilerplate, where
  * near-total mutual Jaccard failure makes the O(bucket²) verify pure
  * waste.
  *
  * Stages, all timed: (1) write-time-capped index build
  * (writeNeardupIndex(maxBucket) NULLs hot bands at write — the
  * documented armed-streaming default), (2) standing labels = CC over
  * the capped index's own verified pairs, (3) the ingest merge with
  * both batch screens capped (the d14b_merge_capped shape at a
  * production cap). Recall contract: hot-template boilerplate buckets
  * are dropped (SkewGuard.capBuckets); genuine duplicate families
  * sit orders of magnitude below a production cap.
  *
  * Usage: runMain graft.tools.ProbeZipfMerge [zipfDir] [maxBucket]
  */
object ProbeZipfMerge {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft-sf100z")
    val cap = args.drop(1).headOption.map(_.toInt).getOrElse(500)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[zipfmerge] $what: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    println(s"[zipfmerge] corpus=${docs.count()} docs, cap=$cap")
    val root = java.nio.file.Files
      .createTempDirectory("graft-zipfmerge").toString
    val idxPath = s"$root/idx"

    // (0) the pre-flight refusal the UNGUARDED builders now run (r14
    // verdict #3): one linear histogram pass prices the screen and
    // refuses loud — on this corpus it must FIRE at the fixture
    // builders' default threshold (the alternative was 66 GB of spill
    // and a kill); on every sf testdata dir it must stay silent
    // (CORRECTNESS runs the unguarded builders there each round).
    timed("pre-flight occupancy refusal (the unguarded builders' guard)") {
      val sigs = Dedup.signaturesFromShingles(Dedup.shingleFrame(docs))
      val occ = Dedup.maxBandOccupancy(sigs)
      val refused =
        try { Dedup.refuseHotBuckets(sigs, 1000, "zipf probe"); false }
        catch { case _: IllegalStateException => true }
      println(s"[zipfmerge]   max band occupancy: $occ; " +
        s"refused at default 1000: $refused")
      assert(refused, "the zipf corpus must trip the pre-flight refusal")
    }

    // (0b) the GENERALIZED refusal surfaces (r15 verdict #4): the
    // winnow fingerprint join and the simhash band join carry the same
    // unguarded all-pairs-per-bucket shape — both must fire HERE (the
    // zipf boilerplate makes hot fingerprint posting lists and
    // identical simhashes) and stay silent at every sf dir (verified
    // by the round's CORRECTNESS run, whose d15/d16/d5 rows are
    // unguarded). Timed: the refusal pass IS the pre-flight price.
    timed("winnow fingerprint pre-flight (d15/d16 surface)") {
      val refused =
        try { Dedup.winnowSharedSpans(docs, 3, 4).count(); false }
        catch { case e: IllegalStateException =>
          e.getMessage.contains("winnow fingerprint") }
      println(s"[zipfmerge]   winnow refusal fired: $refused")
      assert(refused, "the zipf corpus must trip the winnow pre-flight")
    }
    timed("simhash band pre-flight (d5 surface)") {
      val toks = docs.select(col("doc_id"),
        explode(array_distinct(split(col("text"), "\\s+"))).as("t"))
      val sim = Dedup.simhash(toks, hashMode = "xxh64").persist()
      val refused =
        try { Dedup.simhashBandPairs(sim, 2).count(); false }
        catch { case e: IllegalStateException =>
          e.getMessage.contains("simhash band") }
      println(s"[zipfmerge]   simhash refusal fired: $refused")
      sim.unpersist()
      assert(refused, "the zipf corpus must trip the simhash pre-flight")
    }
    graft.core.CacheScope.releaseAll()

    // (1) corpus index, WRITE-TIME cap: hot bands nulled once, every
    // consumer screens unarmed against it
    timed(s"armed index build (writeNeardupIndex maxBucket=$cap)") {
      Dedup.writeNeardupIndex(docs.filter(col("doc_id") % 5 =!= 0),
        idxPath, "text", "doc_id", cap)
    }
    val index = Dedup.readNeardupIndex(spark, idxPath)

    // (2) standing labels over the capped index's own pair graph —
    // what the unguarded fixture builder could not finish at this scale
    val labels = timed("standing labels (CC over capped-index pairs)") {
      val pairs = Dedup.verifyJaccardOnShingles(
          index.select(col("doc_id"), col("sh")),
          Dedup.candidatePairs(index), 0.8)
        .select(col("a_id"), col("b_id"))
      val l = Dedup.connectedComponents(pairs)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println(s"[zipfmerge]   labeled docs: ${l.count()}")
      l
    }

    // (3) the ingest merge, both batch screens capped (the
    // d14b_merge_capped shape at a production cap)
    timed(s"ingest merge (both screens capped at $cap)") {
      val batch = docs.filter(col("doc_id") % 5 === 0)
      val cross = Dedup.incrementalNeardup(spark, batch, idxPath, 0.8,
          maxBucket = cap, skewMode = "drop")
        .select(col("batch_id").as("a_id"), col("corpus_id").as("b_id"))
      val bsh = Dedup.shingleFrame(batch)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val internal = Dedup.verifyJaccardOnShingles(bsh,
          Dedup.candidatePairs(
            Dedup.signaturesFromShingles(bsh), maxBucket = cap), 0.8)
        .select(col("a_id"), col("b_id"))
      val merged = Dedup.mergeIntoClusters(labels, internal.union(cross))
      println(s"[zipfmerge]   merged labels: ${merged.count()}")
      bsh.unpersist()
    }

    // (4) the SAME ingest through the STREAMING maintainer (r14 verdict
    // #2's scale witness): labelMaintainer's foreachBatch body with the
    // arming dials, against a committed labels artifact — screens,
    // merge, AND the atomic replace publish, exactly what one zipf
    // micro-batch costs a standing stream. The labels artifact is
    // seeded from stage (2)'s frame so the maintainer starts where a
    // production stream would.
    val labelsPath = s"$root/labels"
    timed("labels artifact seed (untimed in production — bootstrap)") {
      graft.core.IndexStore.ensure(spark, labelsPath) { scratch =>
        labels.write.mode("overwrite").parquet(scratch)
      }
    }
    timed(s"STREAMING maintainer micro-batch (armed drop@$cap, incl. publish)") {
      graft.streaming.StreamClusters.labelMaintainer(
        idxPath, labelsPath, 0.8, maxBucket = cap, skewMode = "drop")(
        docs.filter(col("doc_id") % 5 === 0), 0L)
      println(s"[zipfmerge]   maintained labels: " +
        graft.core.IndexStore.read(spark, labelsPath,
          "labels", "initLabels").count())
    }
    spark.stop()
  }
}
