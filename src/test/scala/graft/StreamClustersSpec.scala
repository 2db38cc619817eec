package graft

import graft.ext.Dedup
import graft.sources.Tables
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming cluster-label maintenance (StreamClusters): after the
  * ingest stream delivers the batch docs, the committed labels
  * artifact equals the from-scratch d7 clustering of the combined
  * corpus (the d14 star-forest identity), and a crash-replayed
  * micro-batch is a no-op by merge idempotence. */
class StreamClustersSpec extends SparkTestBase {
  import spark.implicits._

  test("streamed label maintenance equals from-scratch clustering; replay idempotent") {
    implicit val sq = spark.sqlContext
    val docs = Tables(spark, sf()).documents
    val root = java.nio.file.Files
      .createTempDirectory("graft-streamclusters").toString
    val (idxPath, labelsPath) = (s"$root/idx", s"$root/labels")
    Dedup.writeNeardupIndex(docs.filter(col("doc_id") % 5 =!= 0), idxPath)
    graft.streaming.StreamClusters.initLabels(spark, idxPath, labelsPath, 0.8)

    // the bootstrap is the index-side clustering only
    val boot = spark.read.parquet(labelsPath).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val batch = docs.filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text")
      .writeStream.option("checkpointLocation", s"$root/ckpt")
      .foreachBatch(
        graft.streaming.StreamClusters.labelMaintainer(idxPath, labelsPath, 0.8))
      .start()
    try { mem.addData(batch: _*); q.processAllAvailable() } finally q.stop()

    def labels() = spark.read.parquet(labelsPath).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val streamed = labels()
    assert(streamed !== boot, "the batch must have merged new pairs")

    // the d14 identity: standing labels + batch/cross pairs == CC over
    // the COMBINED corpus pair graph (d7), hash-equal member for member
    val expected = graft.queries.DedupQueries.dupClusters(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed === expected,
      "streamed label maintenance must equal from-scratch clustering")

    // crash replay: re-delivering the same micro-batch converges to the
    // identical artifact (merge idempotence — no batch bookkeeping)
    graft.streaming.StreamClusters.labelMaintainer(idxPath, labelsPath, 0.8)(
      docs.filter(col("doc_id") % 5 === 0).select(col("doc_id"), col("text")), 0L)
    assert(labels() === expected, "a replayed batch must be a label no-op")

    // an empty trigger never touches the artifact
    val before = java.nio.file.Files.getLastModifiedTime(
      java.nio.file.Paths.get(labelsPath, "_SUCCESS"))
    graft.streaming.StreamClusters.labelMaintainer(idxPath, labelsPath, 0.8)(
      docs.filter(col("doc_id") < 0).select(col("doc_id"), col("text")), 1L)
    assert(java.nio.file.Files.getLastModifiedTime(
        java.nio.file.Paths.get(labelsPath, "_SUCCESS")) === before,
      "an empty micro-batch must not republish")
  }

  test("armed maintainer per-batch semantics equal the batch merge twins") {
    // r14 verdict #2: the maintainer's screens were the one unguarded
    // copy of the screen class the zipf decade proved DNFs (66 GB
    // spill) on boilerplate-heavy corpora. The dials must reproduce the
    // batch merge registrations exactly: drop-capped == d14b_merge_capped,
    // salt == unguarded == d14b_merge_pre (output-invariant split).
    val docs = Tables(spark, sf()).documents
    val batch = docs.filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), col("text"))
    val root = java.nio.file.Files
      .createTempDirectory("graft-scarmed").toString
    val idxPath = s"$root/idx"
    Dedup.writeNeardupIndex(docs.filter(col("doc_id") % 5 =!= 0), idxPath)

    def run(maxBucket: Int, skewMode: String, name: String) = {
      val labelsPath = s"$root/$name"
      graft.streaming.StreamClusters.initLabels(spark, idxPath, labelsPath, 0.8)
      graft.streaming.StreamClusters.labelMaintainer(
        idxPath, labelsPath, 0.8, maxBucket, skewMode)(batch, 0L)
      spark.read.parquet(labelsPath).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    def twin(fn: (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame) =
      fn(spark, sf()).collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val unguarded = run(0, "drop", "plain")
    assert(unguarded === twin(graft.queries.DedupQueries.incrementalClustersPre),
      "unguarded maintainer must equal d14b_merge_pre")
    assert(run(2, "salt", "salted") === unguarded,
      "the salt split is output-invariant — armed == unguarded exactly")
    assert(run(1, "drop", "capped") ===
        twin(graft.queries.DedupQueries.incrementalClustersCapped),
      "drop-capped maintainer must equal d14b_merge_capped's semantics")

    // the registered d14c_merge_stream runs this exact body over a
    // scratch copy of the committed fixture — same labels as the
    // oracle-owning twin (it shares d14's oracle verbatim)
    assert(graft.queries.DedupQueries.mergeViaStreamMaintainer(spark, sf())
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet === unguarded,
      "d14c_merge_stream must equal d14b_merge_pre")
    graft.core.CacheScope.releaseAll()
  }

  test("delta publish: base+delta equals replace mode across an uncompacted chain") {
    // r15 verdict #1: the replace publish rewrites the FULL labels
    // artifact per trigger — O(corpus-labels) I/O at the 100 TB design
    // point. The delta mode lands only the changed labels as committed
    // delta=<batchId> dirs over an untouched Upsert base; this pins the
    // reader-equivalence contract: after every trigger, readLabels on
    // the delta log equals the replace-mode artifact exactly — across
    // an UNCOMPACTED delta chain, through a batch-id replay, and across
    // the cadence compaction.
    import graft.streaming.StreamClusters
    val docs = Tables(spark, sf()).documents
    val root = java.nio.file.Files
      .createTempDirectory("graft-scmor").toString
    val idxPath = s"$root/idx"
    Dedup.writeNeardupIndex(docs.filter(col("doc_id") % 5 =!= 0), idxPath)
    StreamClusters.initLabels(spark, idxPath, s"$root/rep", 0.8)
    StreamClusters.initLabelsLog(spark, idxPath, s"$root/log", 0.8, nBuckets = 4)
    def view(p: String) = StreamClusters.readLabels(spark, p).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(view(s"$root/log") === view(s"$root/rep"),
      "the two bootstraps must agree before any trigger")

    // two triggers splitting the standard batch — the chain stays
    // uncompacted between them
    val trig = Seq(docs.filter(col("doc_id") % 10 === 0),
                   docs.filter(col("doc_id") % 10 === 5))
      .map(_.select(col("doc_id"), col("text")))
    trig.zipWithIndex.foreach { case (t, i) =>
      StreamClusters.labelMaintainer(idxPath, s"$root/rep", 0.8)(t, i.toLong)
      StreamClusters.labelMaintainer(idxPath, s"$root/log", 0.8,
        publish = "delta")(t, i.toLong)
      assert(view(s"$root/log") === view(s"$root/rep"),
        s"delta view diverged from replace mode after trigger $i")
    }
    val ids = graft.ext.Upsert.deltas(spark, s"$root/log")
    assert(ids.nonEmpty, "the chain must actually be uncompacted here")
    // publish proportionality: a delta dir carries only changed labels,
    // strictly fewer rows than the standing artifact it would have
    // rewritten in replace mode
    val deltaRows = spark.read.parquet(s"$root/log/delta=${ids.head}").count()
    val totalRows = StreamClusters.readLabels(spark, s"$root/log").count()
    assert(deltaRows < totalRows,
      s"a delta ($deltaRows rows) must be smaller than the artifact ($totalRows)")

    // crash-replay of a committed batch id is a literal write no-op
    val before = view(s"$root/log")
    StreamClusters.labelMaintainer(idxPath, s"$root/log", 0.8,
      publish = "delta")(trig(1), 1L)
    assert(graft.ext.Upsert.deltas(spark, s"$root/log") === ids,
      "a replayed committed batch id must not mint a new delta")
    assert(view(s"$root/log") === before)

    // cadence compaction: fold the chain, reader state identical
    assert(StreamClusters.compactLabels(spark, s"$root/log") === ids.size)
    assert(graft.ext.Upsert.deltas(spark, s"$root/log").isEmpty)
    assert(view(s"$root/log") === before,
      "compaction must not change what readers see")
    graft.core.CacheScope.releaseAll()
  }

  test("arming dials compose with the delta publish: salt-armed == unarmed, both modes") {
    // the two maintainer axes are independent: (maxBucket, skewMode)
    // arm the SCREENS, publish picks the ARTIFACT shape. The salt arm
    // is output-invariant, so salt+delta must equal unarmed+replace
    // exactly — pinning that the delta path reuses the same armed
    // screens rather than a private copy.
    import graft.streaming.StreamClusters
    val docs = Tables(spark, sf()).documents
    val root = java.nio.file.Files
      .createTempDirectory("graft-scarmdelta").toString
    val idxPath = s"$root/idx"
    Dedup.writeNeardupIndex(docs.filter(col("doc_id") % 5 =!= 0), idxPath)
    val batch = docs.filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), col("text"))
    def view(p: String) = StreamClusters.readLabels(spark, p).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    StreamClusters.initLabels(spark, idxPath, s"$root/rep", 0.8)
    StreamClusters.labelMaintainer(idxPath, s"$root/rep", 0.8)(batch, 0L)

    StreamClusters.initLabelsLog(spark, idxPath, s"$root/log-salt", 0.8, 4)
    StreamClusters.labelMaintainer(idxPath, s"$root/log-salt", 0.8,
      maxBucket = 2, skewMode = "salt", publish = "delta")(batch, 0L)
    assert(view(s"$root/log-salt") === view(s"$root/rep"),
      "salt-armed delta publish must equal the unarmed replace twin")

    // drop-armed delta equals drop-armed replace (same capped pair set
    // through either artifact shape)
    StreamClusters.initLabels(spark, idxPath, s"$root/rep-cap", 0.8)
    StreamClusters.labelMaintainer(idxPath, s"$root/rep-cap", 0.8,
      maxBucket = 1, skewMode = "drop")(batch, 0L)
    StreamClusters.initLabelsLog(spark, idxPath, s"$root/log-cap", 0.8, 4)
    StreamClusters.labelMaintainer(idxPath, s"$root/log-cap", 0.8,
      maxBucket = 1, skewMode = "drop", publish = "delta")(batch, 0L)
    assert(view(s"$root/log-cap") === view(s"$root/rep-cap"),
      "drop-armed delta publish must equal the drop-armed replace twin")
    graft.core.CacheScope.releaseAll()
  }

  test("full lifecycle: ingest -> cadence rebuild -> re-bootstrap -> resume") {
    // r13 verdict #5: the scope contract defers cross-batch new-new
    // pairs to "the index's cadence rebuild" — this drives the whole
    // loop a production operator runs: (1) stream under generation 1,
    // (2) planned stop + fold the streamed docs into the index + re-cap
    // (compactNeardupIndex), (3) re-bootstrap generation-2 labels from
    // the rebuilt index (the deferred pairs appear HERE), (4) resume
    // the maintainer from the same checkpoint against generation 2.
    implicit val sq = spark.sqlContext
    val docs = Tables(spark, sf()).documents
    val root = java.nio.file.Files
      .createTempDirectory("graft-sclifecycle").toString
    val idxPath = s"$root/idx"
    Dedup.writeNeardupIndex(docs.filter(col("doc_id") % 5 =!= 0), idxPath)
    graft.streaming.StreamClusters.initLabels(spark, idxPath, s"$root/gen1", 0.8)

    // a synthetic duplicate pair that shares nothing with the corpus,
    // split across two triggers — the exact deferred-pair shape
    val dupText = (0 until 30).map(i => s"zq$i").mkString(" ")
    val trigA = docs.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq :+ (100000L, dupText)
    val trigB = docs.filter(col("doc_id") % 10 === 5)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq :+ (100005L, dupText)

    val mem = MemoryStream[(Long, String)]
    def start(labelsPath: String) = mem.toDF().toDF("doc_id", "text")
      .writeStream.option("checkpointLocation", s"$root/ckpt")
      .foreachBatch(
        graft.streaming.StreamClusters.labelMaintainer(idxPath, labelsPath, 0.8))
      .start()
    def labels(path: String) = spark.read.parquet(path).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def fromScratch(all: org.apache.spark.sql.DataFrame) = {
      val sh = Dedup.shingleFrame(all)
      val pairs = Dedup.verifyJaccardOnShingles(sh,
          Dedup.candidatePairs(Dedup.signaturesFromShingles(sh)), 0.8)
        .select(col("a_id"), col("b_id"))
      Dedup.connectedComponents(pairs).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }

    // (1) generation-1 stream: two triggers; the synthetic pair spans
    // them, matches nothing in the index, so the SCOPE CONTRACT says
    // neither doc may be labeled yet
    val q1 = start(s"$root/gen1")
    try {
      mem.addData(trigA: _*); q1.processAllAvailable()
      mem.addData(trigB: _*); q1.processAllAvailable()
    } finally q1.stop() // the planned restart at the cadence point
    val gen1 = labels(s"$root/gen1")
    assert(!gen1.exists(l => l._1 == 100000L || l._1 == 100005L),
      "cross-trigger new-new pairs must be deferred, not found early")

    // (2) cadence rebuild: fold the streamed docs into the index, then
    // the periodic re-cap rewrite (cap far above any duplicate family
    // here — the machinery, not the drop, is under test)
    val streamed = (trigA ++ trigB).toDF("doc_id", "text")
    Dedup.appendToNeardupIndex(streamed, idxPath)
    Dedup.compactNeardupIndex(spark, idxPath, maxBucket = 1000)

    // (3) generation-2 bootstrap: CC over the REBUILT index's own pair
    // graph — the deferred synthetic pair appears exactly here
    graft.streaming.StreamClusters.initLabels(spark, idxPath, s"$root/gen2", 0.8)
    val gen2 = labels(s"$root/gen2")
    val combined = docs.select(col("doc_id"), col("text")).unionByName(streamed)
    assert(gen2 === fromScratch(combined),
      "re-bootstrapped labels must equal from-scratch clustering " +
        "of corpus + streamed docs")
    assert(gen2.contains((100005L, 100000L)),
      "the deferred cross-batch pair must be clustered by the rebuild")

    // (4) resume from the SAME checkpoint against generation 2: only
    // new data is processed; a new doc duplicating a STREAMED doc now
    // pairs against the rebuilt index
    val q2 = start(s"$root/gen2")
    try { mem.addData((100010L, dupText)); q2.processAllAvailable() }
    finally q2.stop()
    val resumed = labels(s"$root/gen2")
    assert(resumed.contains((100010L, 100000L)),
      "the resumed stream must screen against the new index generation")
    assert(resumed === fromScratch(
        combined.unionByName(Seq((100010L, dupText)).toDF("doc_id", "text"))),
      "post-resume labels must equal from-scratch clustering of everything")
  }

  test("delta-mode lifecycle: stream -> compact -> fold+re-cap -> gen-2 log -> resume") {
    // the production (delta-publish) twin of the lifecycle above: the
    // cadence point folds the LABEL delta chain (compactLabels) before
    // the planned stop, the generation-2 bootstrap lands as a fresh
    // Upsert log (initLabelsLog), and the resumed maintainer keeps
    // appending deltas against the rebuilt index — the whole runbook
    // with O(batch) publishes end to end.
    implicit val sq = spark.sqlContext
    import graft.streaming.StreamClusters
    val docs = Tables(spark, sf()).documents
    val root = java.nio.file.Files
      .createTempDirectory("graft-scmorlife").toString
    val idxPath = s"$root/idx"
    Dedup.writeNeardupIndex(docs.filter(col("doc_id") % 5 =!= 0), idxPath)
    StreamClusters.initLabelsLog(spark, idxPath, s"$root/gen1", 0.8, 4)

    val dupText = (0 until 30).map(i => s"xw$i").mkString(" ")
    val trigA = docs.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq :+ (200000L, dupText)
    val trigB = docs.filter(col("doc_id") % 10 === 5)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq :+ (200005L, dupText)

    val mem = MemoryStream[(Long, String)]
    def start(labelsPath: String) = mem.toDF().toDF("doc_id", "text")
      .writeStream.option("checkpointLocation", s"$root/ckpt")
      .foreachBatch(StreamClusters.labelMaintainer(
        idxPath, labelsPath, 0.8, publish = "delta"))
      .start()
    def labels(path: String) = StreamClusters.readLabels(spark, path)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def fromScratch(all: org.apache.spark.sql.DataFrame) = {
      val sh = Dedup.shingleFrame(all)
      val pairs = Dedup.verifyJaccardOnShingles(sh,
          Dedup.candidatePairs(Dedup.signaturesFromShingles(sh)), 0.8)
        .select(col("a_id"), col("b_id"))
      Dedup.connectedComponents(pairs).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }

    // (1) generation-1 stream: two delta-publishing triggers; the
    // cross-trigger synthetic pair stays deferred (scope contract)
    val q1 = start(s"$root/gen1")
    try {
      mem.addData(trigA: _*); q1.processAllAvailable()
      mem.addData(trigB: _*); q1.processAllAvailable()
    } finally q1.stop()
    assert(graft.ext.Upsert.deltas(spark, s"$root/gen1").nonEmpty,
      "gen-1 must be carrying an uncompacted delta chain here")
    val gen1 = labels(s"$root/gen1")
    assert(!gen1.exists(l => l._1 == 200000L || l._1 == 200005L),
      "cross-trigger new-new pairs must be deferred in delta mode too")

    // (2) cadence point: fold the LABEL chain (scan-speed reads for
    // consumers of the retiring generation), then the index rebuild
    val folded = StreamClusters.compactLabels(spark, s"$root/gen1")
    assert(folded >= 1)
    assert(labels(s"$root/gen1") === gen1,
      "the label fold must not change reader state")
    val streamed = (trigA ++ trigB).toDF("doc_id", "text")
    Dedup.appendToNeardupIndex(streamed, idxPath)
    Dedup.compactNeardupIndex(spark, idxPath, maxBucket = 1000)

    // (3) generation-2 bootstrap as a fresh LOG from the rebuilt index
    StreamClusters.initLabelsLog(spark, idxPath, s"$root/gen2", 0.8, 4)
    val gen2 = labels(s"$root/gen2")
    val combined = docs.select(col("doc_id"), col("text")).unionByName(streamed)
    assert(gen2 === fromScratch(combined),
      "gen-2 log bootstrap must equal from-scratch clustering")
    assert(gen2.contains((200005L, 200000L)),
      "the deferred cross-batch pair must appear at the rebuild")

    // (4) resume from the SAME checkpoint against the gen-2 log: only
    // new data processed, landing as a delta over the fresh base
    val q2 = start(s"$root/gen2")
    try { mem.addData((200010L, dupText)); q2.processAllAvailable() }
    finally q2.stop()
    assert(labels(s"$root/gen2").contains((200010L, 200000L)),
      "the resumed delta stream must screen against the new generation")
    assert(graft.ext.Upsert.deltas(spark, s"$root/gen2").nonEmpty,
      "the resumed trigger must have landed as a delta, not a rewrite")
    graft.core.CacheScope.releaseAll()
  }
}
