package graft

import java.sql.Timestamp

import graft.streaming.{StreamTemporal, TemporalProbe, TemporalVersion}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The event-time streaming temporal join: golden equality to the
  * batch as-of form on replayed input, answers held until the
  * watermark makes them final, bounded state via the dominance prune,
  * and the deliberate watermark trade (a too-late version is
  * answered-around, not waited for). */
class StreamTemporalSpec extends SparkTestBase {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ts(ms: Long) = new Timestamp(ms)
  private val Min = 60000L

  // transformWithState's named states need column families → RocksDB
  private def withRocksDB[A](f: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try f finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private def drive(batches: Seq[(Seq[TemporalVersion], Seq[TemporalProbe])],
                    delay: String = "1 minute"): Set[(Long, Long, Long, String)] = {
    val vIn = MemoryStream[TemporalVersion]
    val pIn = MemoryStream[TemporalProbe]
    val q = StreamTemporal.join(vIn.toDS(), pIn.toDS(), delay)
      .writeStream.format("memory").queryName("tj_out")
      .outputMode("append").start()
    try {
      batches.foreach { case (vs, ps) =>
        if (vs.nonEmpty) vIn.addData(vs)
        if (ps.nonEmpty) pIn.addData(ps)
        q.processAllAvailable()
      }
    } finally q.stop()
    spark.table("tj_out")
      .select(col("key"), col("probeId"), col("versionId"), col("payload"))
      .as[(Long, Long, Long, String)].collect().toSet
  }

  test("version-only keys prune to one dominant version (state bounded without probes)") { withRocksDB {
    // the r11 advice hole: the dominance prune ran only in
    // handleExpiredTimer, which fired only for keys that receive
    // PROBES — a version-only key hoarded its whole history. The fix
    // registers a cleanup timer on version arrival; this reads the
    // checkpoint's actual state store to prove the list converges.
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-tj-prune").toString
    val vIn = MemoryStream[TemporalVersion]
    val pIn = MemoryStream[TemporalProbe]
    val q = StreamTemporal.join(vIn.toDS(), pIn.toDS(), "1 minute")
      .writeStream.format("memory").queryName("tj_prune")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      // key 1 receives versions ONLY — no probe ever touches it
      vIn.addData(Seq(
        TemporalVersion(1L, ts(1 * Min), 10L, "v1"),
        TemporalVersion(1L, ts(2 * Min), 11L, "v2"),
        TemporalVersion(1L, ts(3 * Min), 12L, "v3")))
      q.processAllAvailable()
      // advance the watermark far past key 1 via another key...
      vIn.addData(Seq(TemporalVersion(9L, ts(100 * Min), 0L, "s")))
      q.processAllAvailable()
      // ...and one more batch so the expired cleanup timer FIRES
      vIn.addData(Seq(TemporalVersion(9L, ts(101 * Min), 1L, "s2")))
      q.processAllAvailable()
    } finally q.stop()
    // no probes for key 1 -> nothing emitted for it
    assert(spark.table("tj_prune").filter(col("key") === 1L).count() === 0)
    // the state store itself: key 1's version list pruned to the single
    // dominant version (newest at or below the watermark)
    val state = spark.read.format("statestore")
      .option("path", ckpt).option("stateVarName", "versions").load()
    val key1 = state.filter(col("key.value") === 1L)
      .select(col("list_element.versionId")).as[Long].collect().toSeq
    assert(key1 === Seq(12L),
      s"version-only key must hold exactly its dominant version, got $key1")
  }}

  test("golden: streamed answers equal the batch as-of join on the same rows") {
    // key 1: versions v1@1min, v2@5min; probes at 0.5, 1, 5, 9 min
    // (at-version-ts probes take that version: <= semantics);
    // key 2: probe with no version ever -> emits nothing
    val versions = Seq(
      TemporalVersion(1L, ts(1 * Min), 10L, "v1"),
      TemporalVersion(1L, ts(5 * Min), 20L, "v2"))
    val probes = Seq(
      TemporalProbe(1L, ts(Min / 2), 100L), TemporalProbe(1L, ts(1 * Min), 101L),
      TemporalProbe(1L, ts(5 * Min), 102L), TemporalProbe(1L, ts(9 * Min), 103L),
      // same (key, ts) as 103: both probes register the same event-time
      // timer — registration must be idempotent and BOTH must answer
      TemporalProbe(1L, ts(9 * Min), 104L),
      TemporalProbe(2L, ts(5 * Min), 200L))
    // sentinel far past everything so the watermark releases all answers
    val sentinel = Seq(TemporalVersion(9L, ts(1000 * Min), 0L, "s"))
    val got = withRocksDB { drive(Seq(
      (versions, probes),
      (sentinel, Seq(TemporalProbe(9L, ts(1000 * Min), 900L))))) }
      .filter(_._1 != 9L)
    // the batch oracle: AsOf.lastRightRow over the same rows
    val want = graft.ops.AsOf.lastRightRow(
        probes.toDF().withColumn("tsMs", col("ts").cast("long") * 1000),
        versions.toDF().withColumn("tsMs", col("ts").cast("long") * 1000),
        "key", "tsMs", "tsMs", "versionId", "__v",
        Seq("probeId"), Seq("versionId", "payload"))
      .filter(col("__v").isNotNull)
      .select(col("key"), col("probeId"),
        col("__v.versionId"), col("__v.payload"))
      .as[(Long, Long, Long, String)].collect().toSet
    assert(got === want)
    assert(got === Set(
      (1L, 101L, 10L, "v1"), (1L, 102L, 20L, "v2"),
      (1L, 103L, 20L, "v2"), (1L, 104L, 20L, "v2")))
  }

  test("composition: the upsert CDC feed drives the temporal join as its version side") { withRocksDB {
    import graft.ext.Upsert
    import graft.streaming.StreamUpsert
    // a versioned table: k1 gets v1@1min then v2@5min as CDC deltas
    val p = java.nio.file.Files.createTempDirectory("graft-tj-feed").toString + "/t"
    Upsert.init(Seq((1L, 0L, "v0")).toDF("k", "tsMs", "v"), p, "k", Seq("tsMs"), 4)
    Upsert.appendChanges(spark, p,
      Seq((1L, 1 * Min, "v1", "U")).toDF("k", "tsMs", "v", "op"))
    Upsert.appendChanges(spark, p,
      Seq((1L, 5 * Min, "v2", "U")).toDF("k", "tsMs", "v", "op"))
    // the feed IS the version stream: change rows -> TemporalVersion
    val versions = StreamUpsert.feed(spark, p)
      .select(col("k").as("key"), timestamp_millis(col("tsMs")).as("ts"),
        col("delta_id").as("versionId"), col("v").as("payload"))
      .as[TemporalVersion]
    val pIn = MemoryStream[TemporalProbe]
    val q = StreamTemporal.join(versions, pIn.toDS(), "1 minute")
      .writeStream.format("memory").queryName("tj_feed")
      .outputMode("append").start()
    try {
      pIn.addData(TemporalProbe(1L, ts(2 * Min), 100L), // sees v1
                  TemporalProbe(1L, ts(6 * Min), 101L)) // sees v2
      q.processAllAvailable()
      // a LIVE table change is picked up by the running subscription...
      Upsert.appendChanges(spark, p,
        Seq((1L, 7 * Min, "v3", "U")).toDF("k", "tsMs", "v", "op"))
      pIn.addData(TemporalProbe(1L, ts(8 * Min), 102L)) // sees v3
      q.processAllAvailable()
      // ...and the sentinel finalizes every answer
      pIn.addData(TemporalProbe(9L, ts(1000 * Min), 900L))
      Upsert.appendChanges(spark, p,
        Seq((9L, 1000 * Min, "s", "U")).toDF("k", "tsMs", "v", "op"))
      q.processAllAvailable()
      val got = spark.table("tj_feed")
        .select(col("probeId"), col("payload")).as[(Long, String)]
        .collect().toSet.filter(_._1 != 900L)
      assert(got === Set((100L, "v1"), (101L, "v2"), (102L, "v3")),
        "events must enrich against the table version visible at their event time")
    } finally q.stop()
  } }

  test("an answer is held until the watermark finalizes it") { withRocksDB {
    val vIn = MemoryStream[TemporalVersion]
    val pIn = MemoryStream[TemporalProbe]
    val q = StreamTemporal.join(vIn.toDS(), pIn.toDS(), "1 minute")
      .writeStream.format("memory").queryName("tj_hold")
      .outputMode("append").start()
    try {
      vIn.addData(TemporalVersion(1L, ts(1 * Min), 10L, "v1"))
      pIn.addData(TemporalProbe(1L, ts(2 * Min), 100L))
      q.processAllAvailable()
      // watermark is still behind the probe: nothing may be emitted,
      // because a version at ts <= 2min could still arrive
      assert(spark.table("tj_hold").isEmpty)
      // ...and one does: a version BETWEEN v1 and the probe
      vIn.addData(TemporalVersion(1L, ts(90 * 1000), 15L, "v1.5"))
      q.processAllAvailable()
      vIn.addData(TemporalVersion(9L, ts(100 * Min), 0L, "s")) // advance wm
      q.processAllAvailable()
      val got = spark.table("tj_hold")
        .select(col("probeId"), col("payload")).as[(Long, String)].collect().toSet
      assert(got === Set((100L, "v1.5")),
        "the held answer must reflect the version that arrived before finalization")
    } finally q.stop()
  } }

  test("the watermark trade: a version later than the delay is answered-around") { withRocksDB {
    val vIn = MemoryStream[TemporalVersion]
    val pIn = MemoryStream[TemporalProbe]
    val q = StreamTemporal.join(vIn.toDS(), pIn.toDS(), "1 minute")
      .writeStream.format("memory").queryName("tj_late")
      .outputMode("append").start()
    try {
      vIn.addData(TemporalVersion(1L, ts(1 * Min), 10L, "v1"))
      pIn.addData(TemporalProbe(1L, ts(3 * Min), 100L))
      vIn.addData(TemporalVersion(9L, ts(100 * Min), 0L, "s")) // wm far ahead
      q.processAllAvailable()
      // this version WOULD have won (ts 2min <= probe 3min) but it is
      // beyond the watermark: dropped, the answer stands at v1
      vIn.addData(TemporalVersion(1L, ts(2 * Min), 15L, "too-late"))
      q.processAllAvailable()
      val got = spark.table("tj_late")
        .select(col("probeId"), col("payload")).as[(Long, String)].collect().toSet
      assert(got === Set((100L, "v1")))
    } finally q.stop()
  } }
}
