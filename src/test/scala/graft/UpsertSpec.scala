package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.ext.Upsert

/** The upsert table's contract:
  *  - init + applyChanges equals the one-shot latest-per-key answer;
  *  - ONLY touched buckets are rewritten — untouched bucket dirs keep
  *    their exact file listing (names + mtimes);
  *  - deletes tombstone a key, a later upsert revives it;
  *  - re-applying the same change batch is a no-op on content;
  *  - a torn (markerless) bucket dir is invisible to readers;
  *  - a drifted/corrupt spec fails loud.
  */
class UpsertSpec extends SparkTestBase {
  import spark.implicits._

  private def mkPath(): String =
    java.nio.file.Files.createTempDirectory("graft-upsert").toString + "/t"

  private def row(k: Long, ts: Long, v: String) = (k, ts, v)

  private def table(path: String): Set[(Long, Long, String)] =
    Upsert.readTable(spark, path)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet

  test("null keys are refused LOUD on both write paths, never merged as a phantom group") {
    // xxhash64(NULL) is NOT null in Spark (HashExpression is
    // nullable=false) — a null key silently hashes to a real bucket, so
    // the refusal must be an explicit null probe, not a null-bucket
    // check (the first cut checked the bucket list and was dead code).
    val p = mkPath()
    Upsert.init(Seq(row(1, 10, "a")).toDF("k", "ts", "v"), p, "k", Seq("ts"), 4)
    val nullKeyed = Seq((Some(2L), 20L, "b", "U"), (None, 20L, "x", "U"))
      .toDF("k", "ts", "v", "op")
    val eCow = intercept[IllegalArgumentException] {
      Upsert.applyChanges(spark, p, nullKeyed)
    }
    assert(eCow.getMessage.contains("NULL values in key column"))
    val eMor = intercept[IllegalArgumentException] {
      Upsert.appendChanges(spark, p, nullKeyed)
    }
    assert(eMor.getMessage.contains("NULL values in key column"))
    // nothing landed: the table still serves exactly the base
    assert(table(p) === Set((1L, 10L, "a")))
    assert(Upsert.deltas(spark, p).isEmpty)
  }

  test("init keeps the latest row per key; apply merges changes in") {
    val p = mkPath()
    val base = Seq(row(1, 10, "a0"), row(1, 20, "a1"),
                   row(2, 10, "b0"), row(3, 10, "c0"))
      .toDF("k", "ts", "v")
    Upsert.init(base, p, "k", Seq("ts"), 4)
    assert(table(p) === Set((1L, 20L, "a1"), (2L, 10L, "b0"), (3L, 10L, "c0")))

    val changes = Seq((1L, 30L, "a2", "U"), (4L, 5L, "d0", "U"))
      .toDF("k", "ts", "v", "op")
    Upsert.applyChanges(spark, p, changes)
    assert(table(p) === Set((1L, 30L, "a2"), (2L, 10L, "b0"),
                            (3L, 10L, "c0"), (4L, 5L, "d0")))
  }

  test("only touched buckets are rewritten; the rest byte-stable") {
    val p = mkPath()
    // enough keys that every one of the 8 buckets is populated
    val base = (1L to 200L).map(k => row(k, 10, s"v$k")).toDF("k", "ts", "v")
    Upsert.init(base, p, "k", Seq("ts"), 8)

    def listing(): Map[String, Set[(String, Long)]] = {
      val f = new Path(p).getFileSystem(spark.sessionState.newHadoopConf())
      f.listStatus(new Path(p)).filter(_.isDirectory).map { d =>
        d.getPath.getName ->
          f.listStatus(d.getPath).map(s =>
            (s.getPath.getName, s.getModificationTime)).toSet
      }.toMap
    }
    val before = listing()

    val oneKey = Seq((7L, 20L, "v7b", "U")).toDF("k", "ts", "v", "op")
    Upsert.applyChanges(spark, p, oneKey)
    val after = listing()

    val touched = "bucket=" + Seq(7L).toDF("k")
      .select(pmod(xxhash64(col("k")), lit(8)).cast("int")).head().getInt(0)
    assert(after(touched) !== before(touched), "the touched bucket must change")
    (before.keySet - touched).foreach { b =>
      assert(after(b) === before(b), s"untouched bucket $b was rewritten")
    }
    // and the content is right
    assert(table(p).contains((7L, 20L, "v7b")))
    assert(table(p).size === 200)
  }

  test("tombstones persist: stale updates lose, later updates revive") {
    val p = mkPath()
    Upsert.init(Seq(row(1, 10, "a"), row(2, 10, "b")).toDF("k", "ts", "v"),
      p, "k", Seq("ts"), 2)
    Upsert.applyChanges(spark, p,
      Seq((1L, 20L, "x", "D")).toDF("k", "ts", "v", "op"))
    assert(table(p) === Set((2L, 10L, "b")))
    // the tombstone is STORED (raw view), not just applied
    assert(Upsert.readRaw(spark, p).filter(col("op") === "D").count() === 1)
    // a straggler ordered BEFORE the tombstone must lose to it —
    // the case that silently resurrects the key if tombstones are
    // dropped at write instead of persisted
    Upsert.applyChanges(spark, p,
      Seq((1L, 15L, "stale", "U")).toDF("k", "ts", "v", "op"))
    assert(table(p) === Set((2L, 10L, "b")),
      "an upsert ordered before the tombstone must lose")
    // an update ordered AFTER the tombstone revives the key
    Upsert.applyChanges(spark, p,
      Seq((1L, 25L, "back", "U")).toDF("k", "ts", "v", "op"))
    assert(table(p) === Set((1L, 25L, "back"), (2L, 10L, "b")))
  }

  test("re-applying the same change batch is a content no-op") {
    val p = mkPath()
    Upsert.init((1L to 50L).map(k => row(k, 10, s"v$k")).toDF("k", "ts", "v"),
      p, "k", Seq("ts"), 4)
    val changes = Seq((3L, 20L, "n3", "U"), (9L, 20L, "n9", "D"))
      .toDF("k", "ts", "v", "op")
    Upsert.applyChanges(spark, p, changes)
    val once = table(p)
    Upsert.applyChanges(spark, p, changes)
    assert(table(p) === once)
    assert(!once.exists(_._1 == 9L) && once.contains((3L, 20L, "n3")))
  }

  test("compaction drops expired tombstones only, and re-opens the straggler window") {
    val p = mkPath()
    Upsert.init(Seq(row(1, 10, "a"), row(2, 10, "b"), row(3, 10, "c"))
      .toDF("k", "ts", "v"), p, "k", Seq("ts"), 2)
    Upsert.applyChanges(spark, p, Seq(
      (1L, 20L, "x", "D"),   // old tombstone — expired at horizon 50
      (2L, 60L, "y", "D")    // recent tombstone — kept
    ).toDF("k", "ts", "v", "op"))
    assert(table(p) === Set((3L, 10L, "c")))
    val dropped = Upsert.compactTombstones(spark, p, col("ts") < 50)
    assert(dropped === 1L)
    val raw = Upsert.readRaw(spark, p).filter(col("op") === "D")
      .collect().map(_.getAs[Long]("k")).toSet
    assert(raw === Set(2L), "only the recent tombstone survives")
    assert(table(p) === Set((3L, 10L, "c")), "live rows untouched")
    // the trade the horizon must bound: a straggler BEFORE the
    // compacted-away delete now resurrects (no tombstone to lose to)
    Upsert.applyChanges(spark, p,
      Seq((1L, 15L, "back", "U")).toDF("k", "ts", "v", "op"))
    assert(table(p).contains((1L, 15L, "back")))
    // the surviving tombstone still guards its key
    Upsert.applyChanges(spark, p,
      Seq((2L, 55L, "stale", "U")).toDF("k", "ts", "v", "op"))
    assert(!table(p).exists(_._1 == 2L))
  }

  test("re-init with a smaller bucket count purges the out-of-range buckets") {
    val p = mkPath()
    Upsert.init((1L to 100L).map(k => row(k, 10, s"v$k")).toDF("k", "ts", "v"),
      p, "k", Seq("ts"), 8)
    // reset to 4 buckets: dirs bucket=4..7 would otherwise stay
    // committed and serve stale rows no applyChanges hash can reach
    Upsert.init((1L to 10L).map(k => row(k, 20, s"w$k")).toDF("k", "ts", "v"),
      p, "k", Seq("ts"), 4)
    assert(table(p) === (1L to 10L).map(k => (k, 20L, s"w$k")).toSet)
    val f = new Path(p).getFileSystem(spark.sessionState.newHadoopConf())
    val dirs = f.listStatus(new Path(p)).filter(_.isDirectory)
      .map(_.getPath.getName).filter(_.startsWith("bucket=")).toSet
    assert(dirs === (0 until 4).map(i => s"bucket=$i").toSet)
  }

  test("a change batch with a narrower key type routes to the right bucket") {
    val p = mkPath()
    Upsert.init(Seq(row(1, 10, "a"), row(2, 10, "b")).toDF("k", "ts", "v"),
      p, "k", Seq("ts"), 8)
    // same key VALUE, INT instead of BIGINT: xxhash64 of 4 bytes would
    // bucket differently; the spec-pinned key type must normalize it
    val changes = Seq((1, 20L, "a2", "U")).toDF("k", "ts", "v", "op")
    assert(changes.schema("k").dataType ===
      org.apache.spark.sql.types.IntegerType)
    Upsert.applyChanges(spark, p, changes)
    assert(table(p) === Set((1L, 20L, "a2"), (2L, 10L, "b")),
      "the INT-keyed change must replace the BIGINT-keyed row, not duplicate it")
  }

  test("a torn (markerless) bucket dir is invisible; corrupt spec is loud") {
    val p = mkPath()
    Upsert.init(Seq(row(1, 10, "a")).toDF("k", "ts", "v"), p, "k", Seq("ts"), 2)
    val f = new Path(p).getFileSystem(spark.sessionState.newHadoopConf())
    // torn dir: data but no marker — a crashed swap's worst case
    val torn = new Path(p, "bucket=9")
    Seq(row(99, 10, "ghost")).toDF("k", "ts", "v")
      .write.parquet(torn.toString)
    f.delete(new Path(torn, "_SUCCESS"), false)
    assert(!table(p).exists(_._1 == 99L), "torn bucket must be invisible")

    val sf = new Path(p, "_graft_upsert_spec")
    val out = f.create(sf, true); out.write("garbage".getBytes); out.close()
    val e = intercept[IllegalStateException] { Upsert.readTable(spark, p) }
    assert(e.getMessage.contains("unparseable"))
  }

  test("registration t6 equals the declarative one-shot answer") {
    val dir = sf("sf0.001")
    val got = graft.queries.StatefulQueries.upsertApply(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ev = graft.sources.Tables(spark, dir).events
    val half = ev.agg(max(col("event_id"))).head().getLong(0) / 2
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts_us").desc, col("event_id").desc)
    val want = ev.select(col("user_id"), col("event_id"), col("ts_us"),
        col("event_type"), row_number().over(w).as("rn"))
      .filter(col("rn") === 1)
      .filter(!(col("event_type") === "error" && col("event_id") > half))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want && got.nonEmpty)
  }
}
