package graft

import graft.ops.AsOf
import org.apache.spark.sql.functions._

/** The as-of operators' edge semantics — the oracle-checked a6/t9
  * registrations cover the bulk path; these pin the boundary rules the
  * union-sort-window form promises: `<=` tie resolution (right before
  * left), right-side tie determinism, and null for a row with no
  * preceding version. */
class AsOfSpec extends SparkTestBase {
  import spark.implicits._

  test("lastRightRow: version visibility, ties, and the no-prior null") {
    // versioned table for key 1: v1@10 (id 100), v2@20 (id 200),
    // two versions at the SAME ts 20 (ids 200, 201 — tie, 201 must win),
    // and key 2 with no versions before its probe
    val hist = Seq(
      (1L, 10L, 100L, "v1"), (1L, 20L, 200L, "v2-early"),
      (1L, 20L, 201L, "v2-late"), (2L, 50L, 300L, "late")
    ).toDF("k", "ts", "rid", "v")
    val probe = Seq(
      (1L, 5L, 1L),   // before any version -> null
      (1L, 10L, 2L),  // AT v1's ts: <= semantics, right before left -> v1
      (1L, 20L, 3L),  // at the tied ts -> the higher rid wins
      (1L, 99L, 4L),  // far after -> still the latest
      (2L, 49L, 5L)   // key 2, just before its only version -> null
    ).toDF("k", "ts", "pid")
    val got = AsOf.lastRightRow(probe, hist, "k", "ts", "ts", "rid",
        "__v", Seq("pid"), Seq("rid", "v"))
      .select(col("pid"), col("__v.v").as("v"))
      .as[(Long, Option[String])].collect().toMap
    assert(got === Map(
      1L -> None, 2L -> Some("v1"), 3L -> Some("v2-late"),
      4L -> Some("v2-late"), 5L -> None))
  }

  test("lastRightRow result is partitioning-invariant (the tiebreak is total)") {
    val hist = (1 to 40).map(i => (i.toLong % 4, i.toLong, i.toLong, s"v$i"))
      .toDF("k", "ts", "rid", "v")
    val probe = (1 to 40).map(i => (i.toLong % 4, i.toLong + 1, i.toLong))
      .toDF("k", "ts", "pid")
    def run(parts: Int) = AsOf.lastRightRow(
        probe.repartition(parts), hist.repartition(parts + 1),
        "k", "ts", "ts", "rid", "__v", Seq("pid"), Seq("rid", "v"))
      .select(col("pid"), col("__v.rid")).as[(Long, Long)].collect().toSet
    assert(run(1) === run(7))
  }
}
