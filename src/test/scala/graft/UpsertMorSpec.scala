package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.ext.Upsert
import graft.streaming.StreamUpsert
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

/** The merge-on-read mode's contract:
  *  - append + read-time merge equals the COW answer on the same
  *    changes, deletes included;
  *  - ordering ties resolve by delta id (later append wins), and
  *    compaction preserves that resolution — read-before equals
  *    read-after row for row;
  *  - compaction folds and removes the deltas; the fast scan path
  *    takes over; a crash BETWEEN the fold and the delta deletes
  *    (deltas still present over the updated base) still reads
  *    correctly — convergence, spec-induced;
  *  - re-append under the same delta id is a no-op (the streaming
  *    exactly-once mechanism), and the auto-id path never reuses a
  *    committed id;
  *  - the streaming deltaAppender is exactly-once across an induced
  *    crash-replay.
  */
class UpsertMorSpec extends SparkTestBase {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def mkTable(rows: Seq[(Long, Long, String)] =
      Seq((1L, 0L, "s1"), (2L, 0L, "s2"))): String = {
    val p = Files.createTempDirectory("graft-mor").toString + "/t"
    Upsert.init(rows.toDF("k", "ts", "v"), p, "k", Seq("ts"), 4)
    p
  }

  private def state(p: String): Set[(Long, Long, String)] =
    Upsert.readTable(spark, p)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet

  test("append + merge-on-read equals copy-on-write, deletes included") {
    val changes = Seq((1L, 10L, "a1", "U"), (2L, 10L, "x", "D"),
                      (3L, 5L, "c1", "U"))
    val cow = mkTable()
    Upsert.applyChanges(spark, cow, changes.toDF("k", "ts", "v", "op"))
    val mor = mkTable()
    Upsert.appendChanges(spark, mor, changes.toDF("k", "ts", "v", "op"))
    assert(state(mor) === state(cow))
    assert(state(mor) === Set((1L, 10L, "a1"), (3L, 5L, "c1")))
  }

  test("ties resolve by delta id, and compaction preserves the resolution") {
    val p = mkTable()
    // two appends carrying the SAME key at the SAME ordering value —
    // only the append order can break the tie
    Upsert.appendChanges(spark, p, Seq((1L, 10L, "first", "U"))
      .toDF("k", "ts", "v", "op"))
    Upsert.appendChanges(spark, p, Seq((1L, 10L, "second", "U"))
      .toDF("k", "ts", "v", "op"))
    val before = state(p)
    assert(before.contains((1L, 10L, "second")), s"later delta must win: $before")
    val folded = Upsert.compactDeltas(spark, p)
    assert(folded === 2)
    assert(state(p) === before, "compaction must not change the visible table")
    assert(Upsert.deltas(spark, p).isEmpty)
  }

  test("a crash between the fold and the delta deletes still reads correctly") {
    val p = mkTable()
    Upsert.appendChanges(spark, p, Seq((1L, 10L, "a1", "U"), (3L, 10L, "c1", "U"))
      .toDF("k", "ts", "v", "op"))
    val before = state(p)
    // the PUBLIC apply refuses while deltas are pending (a COW write
    // under standing deltas is shadowed on ordering ties and corrupts
    // asOf reads) — the crash window below must go through the
    // internal entry compactDeltas itself uses
    intercept[IllegalArgumentException] {
      Upsert.applyChanges(spark, p, Seq((1L, 10L, "a1", "U"))
        .toDF("k", "ts", "v", "op"))
    }
    // induce the crash window by hand: fold into the base exactly as
    // compactDeltas does, but leave the delta dirs in place
    Upsert.applyChangesUnchecked(spark, p, Seq((1L, 10L, "a1", "U"), (3L, 10L, "c1", "U"))
      .toDF("k", "ts", "v", "op"))
    assert(Upsert.deltas(spark, p).nonEmpty, "window: base folded, deltas remain")
    assert(state(p) === before, "deltas over the folded base must re-merge to the same table")
    // and the retried compact converges
    Upsert.compactDeltas(spark, p)
    assert(state(p) === before && Upsert.deltas(spark, p).isEmpty)
  }

  test("same delta id is a no-op; auto ids never reuse a committed id") {
    val p = mkTable()
    val id = Upsert.appendChanges(spark, p,
      Seq((1L, 10L, "a1", "U")).toDF("k", "ts", "v", "op"), deltaId = Some(7L))
    assert(id === 7L)
    // replay with different content under the same id: ignored
    Upsert.appendChanges(spark, p,
      Seq((1L, 99L, "ghost", "U")).toDF("k", "ts", "v", "op"), deltaId = Some(7L))
    assert(state(p).contains((1L, 10L, "a1")) &&
           !state(p).exists(_._3 == "ghost"))
    // auto allocation continues past the committed id
    val auto = Upsert.appendChanges(spark, p,
      Seq((2L, 10L, "b1", "U")).toDF("k", "ts", "v", "op"))
    assert(auto === 8L)
    assert(Upsert.deltas(spark, p) === Seq(7L, 8L))
  }

  test("re-init clears pending deltas: a reset table replays nothing") {
    val p = mkTable()
    Upsert.appendChanges(spark, p,
      Seq((1L, 10L, "stale", "U")).toDF("k", "ts", "v", "op"))
    Upsert.init(Seq((1L, 0L, "fresh")).toDF("k", "ts", "v"),
      p, "k", Seq("ts"), 4)
    assert(Upsert.deltas(spark, p).isEmpty)
    assert(state(p) === Set((1L, 0L, "fresh")),
      "a committed pre-reset delta must not merge over the fresh base")
  }

  test("a torn delta dir (no marker) is invisible to the merge") {
    val p = mkTable()
    Upsert.appendChanges(spark, p,
      Seq((1L, 10L, "a1", "U")).toDF("k", "ts", "v", "op"))
    val f = new Path(p).getFileSystem(spark.sessionState.newHadoopConf())
    val torn = new Path(p, "delta=99")
    Seq((2L, 50L, "ghost", "U", 2)).toDF("k", "ts", "v", "op", "bucket")
      .write.parquet(torn.toString)
    f.delete(new Path(torn, "_SUCCESS"), false)
    assert(Upsert.deltas(spark, p) === Seq(0L))
    assert(!state(p).exists(_._3 == "ghost"))
  }

  test("readTableAsOf replays the table at each delta; -1 is the base alone") {
    val p = mkTable() // k1=s1, k2=s2 at ts 0
    Upsert.appendChanges(spark, p, Seq((1L, 10L, "a1", "U"), (3L, 10L, "c1", "U"))
      .toDF("k", "ts", "v", "op"))                       // delta 0
    Upsert.appendChanges(spark, p, Seq((2L, 20L, "x", "D"))
      .toDF("k", "ts", "v", "op"))                       // delta 1
    def asOf(id: Long) = Upsert.readTableAsOf(spark, p, id)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(asOf(-1L) === Set((1L, 0L, "s1"), (2L, 0L, "s2")))
    assert(asOf(0L) === Set((1L, 10L, "a1"), (2L, 0L, "s2"), (3L, 10L, "c1")))
    assert(asOf(1L) === state(p), "the head snapshot IS the current table")
  }

  test("a compacted snapshot is refused loud; the horizon survives and a reset clears it") {
    val p = mkTable()
    Upsert.appendChanges(spark, p, Seq((1L, 10L, "a1", "U")).toDF("k", "ts", "v", "op"))
    Upsert.appendChanges(spark, p, Seq((1L, 20L, "a2", "U")).toDF("k", "ts", "v", "op"))
    assert(Upsert.compactionHorizon(spark, p) === -1L)
    Upsert.compactDeltas(spark, p)
    assert(Upsert.compactionHorizon(spark, p) === 1L)
    // at/below the fold: unreconstructable, must fail loud
    intercept[IllegalArgumentException] { Upsert.readTableAsOf(spark, p, 0L) }
    intercept[IllegalArgumentException] { Upsert.changeFeed(spark, p, 0L, 5L) }
    // AT the horizon the base is exactly that snapshot — allowed
    assert(Upsert.readTableAsOf(spark, p, 1L).count() === 2)
    // post-fold appends are snapshot-able again
    Upsert.appendChanges(spark, p, Seq((1L, 30L, "a3", "U")).toDF("k", "ts", "v", "op"))
    assert(Upsert.readTableAsOf(spark, p, 2L)
      .filter(col("k") === 1L).head().getString(2) === "a3")
    Upsert.init(Seq((9L, 0L, "fresh")).toDF("k", "ts", "v"), p, "k", Seq("ts"), 4)
    assert(Upsert.compactionHorizon(spark, p) === -1L,
      "a reset table has no fold history")
  }

  test("changeFeed is the net per-key change over a delta range, ops attached") {
    val p = mkTable()
    Upsert.appendChanges(spark, p, Seq((1L, 10L, "a1", "U"))
      .toDF("k", "ts", "v", "op"))                       // delta 0
    Upsert.appendChanges(spark, p, Seq((1L, 20L, "a2", "U"), (2L, 20L, "x", "D"))
      .toDF("k", "ts", "v", "op"))                       // delta 1
    Upsert.appendChanges(spark, p, Seq((1L, 30L, "a3", "U"))
      .toDF("k", "ts", "v", "op"))                       // delta 2
    def feed(s: Long, u: Long) = Upsert.changeFeed(spark, p, s, u)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getString(3))).toSet
    // whole timeline: k1's three updates collapse to the delta-2 winner
    assert(feed(-1L, 2L) === Set((1L, 30L, "a3", "U"), (2L, 20L, "x", "D")))
    // a consumer caught up through delta 0 sees only the tail's net
    assert(feed(0L, 1L) === Set((1L, 20L, "a2", "U"), (2L, 20L, "x", "D")))
    // empty range: empty frame, change schema intact
    val empty = Upsert.changeFeed(spark, p, 2L, 2L)
    assert(empty.count() === 0 &&
      empty.columns.toSeq === Seq("k", "ts", "v", "op"))
    // applying the feed to the asOf base reproduces the head — the
    // consumer contract the feed exists for
    val cow = mkTable()
    Upsert.applyChanges(spark, cow, Upsert.changeFeed(spark, p, -1L, 2L))
    assert(state(cow) === state(p))
  }

  test("plan pin: the feed never scans the base; a snapshot lists only its deltas") {
    val p = mkTable()
    Upsert.appendChanges(spark, p, Seq((1L, 10L, "a1", "U")).toDF("k", "ts", "v", "op"))
    Upsert.appendChanges(spark, p, Seq((2L, 20L, "b1", "U")).toDF("k", "ts", "v", "op"))
    def scanRoots(df: org.apache.spark.sql.DataFrame): Seq[String] =
      // sparkPlan, not executedPlan: AQE wraps the latter in a root
      // AdaptiveSparkPlanExec whose leaves hide the scans until run
      df.queryExecution.sparkPlan.collectLeaves().collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.relation.location.rootPaths.map(_.toString)
      }.flatten
    // the feed's scale claim IS this plan property: delta dirs in
    // range only, the base never enters (ProbeMor's flat changefeed_s)
    val feedRoots = scanRoots(Upsert.changeFeed(spark, p, 0L, 1L))
    assert(feedRoots.nonEmpty && feedRoots.forall(_.contains("delta=1")),
      s"feed must list exactly the in-range delta dirs, got $feedRoots")
    assert(!feedRoots.exists(_.contains("bucket=")), "the base must not be scanned")
    // the snapshot reads the base plus ONLY the deltas it includes
    val snapRoots = scanRoots(Upsert.readTableAsOf(spark, p, 0L))
    assert(snapRoots.exists(_.contains("bucket=")) &&
      snapRoots.exists(_.contains("delta=0")) &&
      !snapRoots.exists(_.contains("delta=1")),
      s"snapshot at 0 must exclude delta=1 at LISTING time, got $snapRoots")
  }

  test("compaction keeps exactly-once: folded ids replay as no-ops, auto ids never recycle") {
    val p = mkTable()
    Upsert.appendChanges(spark, p,
      Seq((1L, 10L, "a1", "U")).toDF("k", "ts", "v", "op"), deltaId = Some(0L))
    Upsert.appendChanges(spark, p,
      Seq((1L, 20L, "a2", "U")).toDF("k", "ts", "v", "op"), deltaId = Some(1L))
    Upsert.compactDeltas(spark, p)
    val folded = state(p)
    // a streaming crash-replay of batch 1 arrives AFTER the compact:
    // the fold already consumed it — replay must not mint delta=1 again
    Upsert.appendChanges(spark, p,
      Seq((1L, 20L, "ghost", "U")).toDF("k", "ts", "v", "op"), deltaId = Some(1L))
    assert(Upsert.deltas(spark, p).isEmpty && state(p) === folded,
      "a folded delta id must replay as a no-op")
    // auto allocation resumes ABOVE the horizon, never recycling 0/1
    // (a recycled id would sit at/below the horizon, invisible to the
    // feed and snapshot guards)
    val id = Upsert.appendChanges(spark, p,
      Seq((2L, 30L, "b1", "U")).toDF("k", "ts", "v", "op"))
    assert(id === 2L, s"auto id must start past the horizon, got $id")
    assert(Upsert.changeFeed(spark, p, 1L, 2L).count() === 1)
  }

  test("schema evolution: added columns null-fill old rows, across MOR, compact and COW") {
    val p = mkTable() // (k, ts, v): k1=s1, k2=s2
    // an evolved delta adds column w
    Upsert.appendChanges(spark, p,
      Seq((1L, 10L, "a1", 7.5, "U")).toDF("k", "ts", "v", "w", "op"))
    def view(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("v"),
        Option(r.getAs[Any]("w")))).toSet
    val mor = view(Upsert.readTable(spark, p))
    assert(mor === Set((1L, "a1", Some(7.5)), (2L, "s2", None)),
      "pre-evolution rows must read the new column as null")
    // the fold carries the evolved schema into the base (COW path),
    // and only k1's bucket was rewritten — readRaw must still see w
    // on every row via the footer merge
    Upsert.compactDeltas(spark, p)
    assert(view(Upsert.readTable(spark, p)) === mor,
      "compaction must preserve the evolved view")
    // whole-row replacement: an OLD-writer batch (no w) replacing k1
    // stores null, never inherits the replaced row's 7.5
    Upsert.applyChanges(spark, p,
      Seq((1L, 20L, "a2", "U")).toDF("k", "ts", "v", "op"))
    assert(view(Upsert.readTable(spark, p).filter(col("k") === 1L)) ===
      Set((1L, "a2", None)),
      "replacement is whole-row: absent columns are null")
    // and the feed surfaces the evolved column too
    Upsert.appendChanges(spark, p,
      Seq((3L, 30L, "c1", 9.0, "U")).toDF("k", "ts", "v", "w", "op"))
    val feed = Upsert.changeFeed(spark, p, 0L, Long.MaxValue)
    assert(feed.columns.contains("w") &&
      feed.filter(col("k") === 3L).head().getAs[Double]("w") === 9.0)
  }

  test("rescale re-hashes every stored row - tombstones and horizon included") {
    val p = mkTable() // 4 buckets: k1=s1, k2=s2
    // history: one folded delta sets the horizon; one persisted tombstone
    Upsert.appendChanges(spark, p, Seq((1L, 10L, "a1", "U")).toDF("k", "ts", "v", "op"))
    Upsert.compactDeltas(spark, p)
    Upsert.applyChanges(spark, p, Seq((2L, 20L, "x", "D")).toDF("k", "ts", "v", "op"))
    val before = state(p)
    val horizonBefore = Upsert.compactionHorizon(spark, p)
    assert(horizonBefore === 0L)
    Upsert.rescale(spark, p, 16)
    assert(Upsert.readSpec(spark, p).n === 16)
    assert(state(p) === before, "the visible table must survive the re-hash")
    assert(Upsert.readRaw(spark, p).filter(col("op") === "D").count() === 1,
      "tombstones must ride the rescale - dropping them re-opens resurrection")
    assert(Upsert.compactionHorizon(spark, p) === horizonBefore,
      "a reset horizon would let replays recycle folded delta ids")
    // the new hash routes: an update through the 16-bucket layout lands
    Upsert.applyChanges(spark, p, Seq((1L, 30L, "a2", "U")).toDF("k", "ts", "v", "op"))
    assert(state(p) === Set((1L, 30L, "a2")))
    // downscale works too, and the tail dirs are gone from the listing
    Upsert.rescale(spark, p, 2)
    assert(Upsert.readSpec(spark, p).n === 2 && state(p) === Set((1L, 30L, "a2")))
    assert(Upsert.readRaw(spark, p).select("bucket").distinct()
      .collect().map(_.getInt(0)).forall(_ < 2))
    // pending deltas carry old-hash bucket ids: refuse loud
    Upsert.appendChanges(spark, p, Seq((3L, 40L, "c1", "U")).toDF("k", "ts", "v", "op"))
    intercept[IllegalArgumentException] { Upsert.rescale(spark, p, 8) }
    Upsert.compactDeltas(spark, p)
    // a live applyChanges staging dir means a writer is mid-swap:
    // rescaling under it would blend hash generations - refuse loud
    val f = new Path(p).getFileSystem(spark.sessionState.newHadoopConf())
    f.mkdirs(new Path(p + ".stage-feedc0de"))
    intercept[IllegalArgumentException] { Upsert.rescale(spark, p, 8) }
    f.delete(new Path(p + ".stage-feedc0de"), true)
    Upsert.rescale(spark, p, 8)
    assert(Upsert.readSpec(spark, p).n === 8)
  }

  test("vacuum reclaims aged orphan scratch/stage dirs, never live or .old-* dirs") {
    val p = mkTable()
    val f = new Path(p).getFileSystem(spark.sessionState.newHadoopConf())
    val orphans = Seq(new Path(p, "bucket=2.build-deadbee1"),
      new Path(p, ".delta-build-deadbee2"),
      new Path(p + ".stage-deadbee3"))
    val keep = Seq(new Path(p, "bucket=1.build-00abcdef"), // young: inside grace
      new Path(p + ".old-deadbee4"))
    (orphans ++ keep).foreach(f.mkdirs)
    val old = System.currentTimeMillis() - 48L * 3600 * 1000
    (orphans :+ keep(1)).foreach(d => f.setTimes(d, old, -1))
    // keep(0) stays YOUNG (now): inside grace, must survive
    assert(Upsert.vacuum(spark, p) === 3L)
    orphans.foreach(d => assert(!f.exists(d), s"orphan $d must be gone"))
    keep.foreach(d => assert(f.exists(d), s"$d must survive"))
    assert(state(p).nonEmpty, "live buckets untouched")
    // grace 0 takes the young scratch too
    assert(Upsert.vacuum(spark, p, graceMs = 0L) === 1L)
  }

  test("streaming deltaAppender is exactly-once across a crash-replay") {
    val p = mkTable()
    val ckpt = Files.createTempDirectory("graft-mor-ckpt").toString
    val in = MemoryStream[(Long, Long, String, String)]
    val append = StreamUpsert.deltaAppender(p)
    val dieOnce = new java.util.concurrent.atomic.AtomicBoolean(true)
    def start() = in.toDS().toDF("k", "ts", "v", "op").writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        append(df, id)
        if (id == 1L && dieOnce.getAndSet(false))
          throw new RuntimeException("induced crash after append")
      }.start()
    val q1 = start()
    in.addData((1L, 10L, "a1", "U")); q1.processAllAvailable()
    in.addData((2L, 20L, "gone", "D"), (3L, 20L, "c1", "U"))
    intercept[Exception] { q1.processAllAvailable(); q1.awaitTermination() }
    q1.stop()
    val q2 = start(); q2.processAllAvailable(); q2.stop()
    assert(Upsert.deltas(spark, p) === Seq(0L, 1L), "replay must not mint a new delta")
    assert(state(p) === Set((1L, 10L, "a1"), (3L, 20L, "c1")))
  }
}
