package graft

import graft.ext.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Winnowed fingerprinting (Schleimer et al. SIGMOD'03) — the
  * guarantee the operator is FOR: any two docs sharing an exact token
  * run of length >= k + w - 1 share a selected fingerprint, so the
  * shared-span join cannot miss long verbatim overlaps. Density and
  * guard behavior round out the contract. */
class WinnowSpec extends SparkTestBase {
  import spark.implicits._

  private val k = 4
  private val w = 4

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  private def spans(df: DataFrame, minShared: Long = 1L,
                    maxBucket: Int = 0): Array[(Long, Long)] =
    Dedup.winnowSharedSpans(df, k, w, minShared, maxBucket)
      .select(col("a_id"), col("b_id"))
      .as[(Long, Long)].collect().sorted

  test("guarantee: a shared run of k + w - 1 tokens is always detected") {
    // the shared run is exactly 7 tokens = one full window of 4 k-grams;
    // everything else in the two docs is disjoint
    val shared = "quick brown foxes jump over lazy dogs"
    val d = docs(
      1L -> s"alpha bravo charlie $shared delta echo foxtrot",
      2L -> s"uno dos tres cuatro $shared cinco seis siete")
    assert(spans(d).contains((1L, 2L)),
      "a full shared window must select the same fingerprint in both docs")
  }

  test("guarantee holds at every alignment of the shared run") {
    // slide the 7-token run through different offsets in doc B; the
    // window min is position-independent (hash values travel with the
    // tokens), so detection must not depend on alignment
    val shared = (0 until k + w - 1).map(i => s"s$i").mkString(" ")
    val fills = (0 until 12).map(i => s"f$i")
    (0 to 12 - 1).foreach { off =>
      val bToks = (fills.take(off) :+ shared) ++ fills.drop(off)
      val d = docs(1L -> shared, 2L -> bToks.mkString(" "))
      assert(spans(d).contains((1L, 2L)), s"missed at offset $off")
    }
  }

  test("short docs still fingerprint (clamped trailing windows)") {
    // k tokens = one k-gram = one (clamped) window; identical short
    // docs must pair up
    val d = docs(1L -> "one two three four", 2L -> "one two three four")
    assert(spans(d).contains((1L, 2L)))
    // below k tokens: no k-grams, no fingerprints, no pairs, no crash
    val tiny = docs(3L -> "just three tokens", 4L -> "just three tokens")
    assert(spans(tiny).isEmpty)
  }

  test("disjoint docs share nothing; minShared filters thin overlaps") {
    val d = docs(
      1L -> (0 until 30).map(i => s"a$i").mkString(" "),
      2L -> (0 until 30).map(i => s"b$i").mkString(" "))
    assert(spans(d).isEmpty)
    // one shared 7-token run yields >= 1 shared fp but (here) fewer
    // than 5 — minShared = 5 must drop the pair
    val shared = "quick brown foxes jump over lazy dogs"
    val thin = docs(
      1L -> s"alpha bravo charlie $shared delta echo foxtrot",
      2L -> s"uno dos tres cuatro $shared cinco seis siete")
    assert(spans(thin, minShared = 5L).isEmpty)
  }

  test("selection density is ~2/(w+1), never the full position set") {
    val text = (0 until 400).map(i => s"tok${i % 397}").mkString(" ")
    val d = docs(1L -> text)
    val kg = Dedup.kgramRows(d, k)
    val nPos = kg.count()
    val nSel = Dedup.winnowSelect(kg, w).count()
    assert(nSel > 0 && nSel < nPos / 2,
      s"selected $nSel of $nPos positions — winnowing should thin to ~2/(w+1)")
  }

  test("identical docs share every selected fingerprint") {
    val text = (0 until 50).map(i => s"word$i").mkString(" ")
    val d = docs(1L -> text, 2L -> text)
    val kg = Dedup.kgramRows(d, k)
    val perDoc = Dedup.winnowSelect(kg, w)
      .groupBy(col("doc_id")).count().as[(Long, Long)].collect().toMap
    val shared = Dedup.winnowSharedSpans(d, k, w, minShared = 1L)
      .select(col("shared_fps")).as[Long].head()
    assert(perDoc(1L) === perDoc(2L))
    assert(shared === perDoc(1L),
      "every selected fingerprint of identical docs must match up")
  }

  test("array-domain selection equals the window-function form on real corpus text") {
    val real = spark.read.parquet(sf() + "/documents.parquet")
      .select(col("doc_id"), col("text"))
    val prod = Dedup.winnowFingerprints(real, k, w)
      .as[(Long, Long, String, String)].collect().toSet
    val ref = Dedup.winnowSelect(Dedup.kgramRows(real, k), w)
      .as[(Long, Long, String, String)].collect().toSet
    assert(prod === ref,
      "shuffle-free array-domain winnowing must reproduce the textbook window form")
    assert(prod.nonEmpty)
  }

  private def extents(df: DataFrame, minLen: Long = 7L) =
    Dedup.winnowSpanExtents(df, k, w, minLen)
      .select(col("a_id"), col("b_id"), col("a_start"), col("a_end"),
        col("b_start"), col("b_end"), col("span_len"))
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSet

  test("extents: a single shared run is recovered on its diagonal") {
    // 20-token shared run: doc 1 at tokens 4..23, doc 2 at 3..22.
    // Interior windows guarantee matched anchors with gaps <= w whose
    // first is <= run_start + w - 1 and last is >= run_end - k - w + 2,
    // so ONE island covering most of the run must come back.
    val shared = (0 until 20).map(i => s"s$i").mkString(" ")
    val d = docs(
      1L -> s"a1 a2 a3 $shared t1 t2",
      2L -> s"b1 b2 $shared u1 u2 u3")
    val got = extents(d)
    assert(got.size === 1, s"one island expected: $got")
    val (aId, bId, aS, aE, bS, bE, len) = got.head
    assert((aId, bId) === (1L, 2L))
    assert(aS >= 4 && aS <= 7, "first anchor within w of the run start")
    assert(aE >= 20 && aE <= 23, "last anchor k-gram reaches the run tail")
    assert(bS - aS === -1 && bE - aE === -1, "one diagonal, one offset")
    assert(len >= 14 && len <= 20)
  }

  test("extents: identical docs merge to one near-full-doc island") {
    val text = (0 until 40).map(i => s"w$i").mkString(" ")
    val d = docs(1L -> text, 2L -> text)
    val got = extents(d)
    assert(got.size === 1)
    val (_, _, aS, aE, bS, bE, len) = got.head
    // first selected anchor is within the first window, the last
    // within the trailing one; diagonal 0
    assert(aS >= 1 && aS <= w)
    assert(aE >= 40 - w + 1 && aE <= 40)
    assert(aS === bS && aE === bE)
    assert(len >= 40 - 2 * (w - 1) && len <= 40)
  }

  test("extents: runs separated by differing text yield separate islands") {
    // same diagonal (equal-length differing gaps); islands must not
    // bridge the difference
    val run1 = (0 until 20).map(i => s"p$i").mkString(" ")
    val run2 = (0 until 20).map(i => s"q$i").mkString(" ")
    val gapA = (0 until 12).map(i => s"ga$i").mkString(" ")
    val gapB = (0 until 12).map(i => s"gb$i").mkString(" ")
    val d = docs(
      1L -> s"$run1 $gapA $run2",
      2L -> s"$run1 $gapB $run2")
    val got = extents(d)
    assert(got.size === 2, s"expected two islands, got $got")
    assert(got.forall { case (_, _, _, _, _, _, len) => len <= 20 },
      "no island may span the differing gap")
  }

  test("extents: one differing token splits the island (no bridging)") {
    // a single substituted token invalidates the k k-grams covering it,
    // leaving an anchor gap >= k+1 > w — the no-bridging half of the
    // exactness argument; each side's island stays <= its sub-run
    val a = (0 until 20).map(i => s"c$i").mkString(" ")
    val b = (0 until 20).map(i => s"d$i").mkString(" ")
    val d = docs(
      1L -> s"$a MID1 $b",
      2L -> s"$a MID2 $b")
    val got = extents(d)
    assert(got.size === 2, s"expected an island per side, got $got")
    assert(got.forall { case (_, _, _, _, _, _, len) => len <= 20 },
      s"an island bridged the differing token: $got")
  }

  test("extents: every emitted extent is a literal identical token slice") {
    // the certified-output invariant, checked on real corpus text by
    // re-slicing both documents
    val real = spark.read.parquet(sf() + "/documents.parquet")
      .select(col("doc_id"), col("text"))
    val toks = real.select(col("doc_id"),
      split(col("text"), "\\s+").as("t"))
    val ext = Dedup.winnowSpanExtents(real, k, w, minLen = 7L)
    val joined = ext
      .join(toks.select(col("doc_id").as("a_id"), col("t").as("ta")), "a_id")
      .join(toks.select(col("doc_id").as("b_id"), col("t").as("tb")), "b_id")
    val n = joined.count()
    val nExact = joined.filter(
      slice(col("ta"), col("a_start").cast("int"), col("span_len").cast("int")) ===
      slice(col("tb"), col("b_start").cast("int"), col("span_len").cast("int")))
      .count()
    assert(n > 0, "fixture should contain shared spans")
    assert(nExact === n, "every extent must be a literal identical run")
  }

  test("maxBucket arms the df-cap on hot fingerprints (drop semantics)") {
    // 20 docs all containing the same boilerplate run -> its selected
    // fingerprints have df 20; two docs additionally share a private
    // run. With the cap at 3 the boilerplate posting lists are dropped,
    // the private pair survives.
    val boiler = "subscribe to our newsletter terms of service apply today"
    val priv = "rare shared phrase only these two documents carry it"
    val d = docs(
      (0L until 20L).map(i =>
        i -> s"${("x" + i + " ") * 3}$boiler filler$i end$i") ++ Seq(
        100L -> s"alpha beta gamma $priv delta",
        101L -> s"uno dos tres $priv cuatro"): _*)
    val got = spans(d, minShared = 1L, maxBucket = 3)
    assert(got.contains((100L, 101L)), "sub-cap pair must survive")
    assert(!got.exists { case (a, b) => a < 20L && b < 20L },
      "boilerplate-only pairs ride exclusively on hot fingerprints and must drop")
  }
}
