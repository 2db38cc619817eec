package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench gate's record parsing — the regression class the r11
  * advisor flagged (first-occurrence regex binding) and the r12 fix
  * (key-order contract: gate keys parsed only from the summary prefix
  * before the "queries" map; sf-gated). Pure-function specs, no Spark. */
class BenchGateSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.1"
  private def record(qs: String, extra: String = ""): String =
    s"""{"metric":"total","value":120.0,"unit":"sec","sf":"$sf",""" +
      s""""lineitem_rows":600000,"documents_rows":5000,""" +
      s""""embeddings_rows":20000,""" +
      s""""q1_rows_per_sec":597551,"docs_rows_per_sec":10578,""" +
      s""""emb_rows_per_sec":40123,""" +
      s""""healed_reps":3,"healed_queries":{"d14_incremental_clusters":2,""" +
      s""""d7_dup_clusters":1},"prod_variants_total":9.0,""" +
      s""""queries":$qs$extra}"""

  test("canaries parse from the summary prefix only") {
    val r = record("""{"q1_pricing_summary":1.0,"d4_simhash":0.7}""")
    assert(Bench.parseCanaries(r, sf) ===
      Map("q1_rows_per_sec" -> 597551.0, "docs_rows_per_sec" -> 10578.0,
          "emb_rows_per_sec" -> 40123.0))
  }

  test("canary-state reference keys parse when the record carries them") {
    // r13 records carry the gate's OWN measurements (canary-state JIT),
    // which the gate prefers over suite-state throughputs — here both
    // families are present and both must parse
    val r13 = s"""{"metric":"total","value":118.0,"sf":"$sf",""" +
      s""""canary_q1_rps":510000,"canary_docs_rps":8139,""" +
      s""""canary_emb_rps":3078,"q1_rows_per_sec":533915,""" +
      s""""docs_rows_per_sec":10385,"queries":{"q1_pricing_summary":1.1}}"""
    val m = Bench.parseCanaries(r13, sf)
    assert(m("canary_docs_rps") === 8139.0)
    assert(m("canary_q1_rps") === 510000.0)
    assert(m("canary_emb_rps") === 3078.0)
    assert(m("docs_rows_per_sec") === 10385.0)
  }

  test("a nested or query-named gate key cannot shadow the record value") {
    // a hostile-but-conceivable map: a query literally named like a gate
    // key, plus a prev_delta echoing one — neither may bind
    val r = record(
      """{"q1_rows_per_sec":1.0,"docs_rows_per_sec":2.0}""",
      ""","prev_delta":{"q1_rows_per_sec":-4.0}""")
    assert(Bench.parseCanaries(r, sf)("q1_rows_per_sec") === 597551.0)
    assert(Bench.parseCanaries(r, sf)("docs_rows_per_sec") === 10578.0)
  }

  test("a record at a different scale factor gates nothing and heals nothing") {
    val r = record("""{"q1_pricing_summary":1.0}""")
    assert(Bench.parseCanaries(r, "/root/testdata/sf0.001") === Map.empty)
    assert(Bench.parsePrevMap(r, "/root/testdata/sf0.001") === Map.empty)
  }

  test("a record predating the docs/emb canaries gates on q1 alone") {
    val legacy = s"""{"metric":"total","value":119.4,"sf":"$sf",""" +
      s""""q1_rows_per_sec":504900,"queries":{"q1_pricing_summary":0.9}}"""
    assert(Bench.parseCanaries(legacy, sf) ===
      Map("q1_rows_per_sec" -> 504900.0))
  }

  test("an r12 record (no emb key) gates on q1 + docs alone") {
    val r12 = s"""{"metric":"total","value":115.1,"sf":"$sf",""" +
      s""""q1_rows_per_sec":533915,"docs_rows_per_sec":10385,""" +
      s""""queries":{"q1_pricing_summary":0.9}}"""
    assert(Bench.parseCanaries(r12, sf) ===
      Map("q1_rows_per_sec" -> 533915.0, "docs_rows_per_sec" -> 10385.0))
  }

  test("the shuffle-tier canary key parses from an r14 record") {
    // r13 verdict #1: all three corpus canaries are scan/hash-shaped
    // and a contended-shuffle window minted a 2.2x-degraded artifact
    // with every canary green — r14 records carry the q_cube
    // canary-state measurement, and the gate must see it
    val r14 = s"""{"metric":"total","value":123.0,"sf":"$sf",""" +
      s""""canary_q1_rps":510000,"canary_docs_rps":8139,""" +
      s""""canary_emb_rps":3078,"canary_shuffle_rps":612000,""" +
      s""""q1_rows_per_sec":533915,"queries":{"q_cube":0.7}}"""
    assert(Bench.parseCanaries(r14, sf)("canary_shuffle_rps") === 612000.0)
  }

  test("the trailer line survives a tail capture that beheads the compact line") {
    // r13: BENCH_r13.json had "parsed": null — the driver keeps the
    // LAST ~2000 chars of stdout, and the summary-first key order only
    // protects against tail-truncation; the compact line's HEAD (every
    // summary key) was cut while its queries map survived. The fix: a
    // final summary-only trailer short enough that any tail capture
    // >= its own length keeps it whole.
    val scalars = s""""unit":"sec","sf":"$sf","lineitem_rows":600572,""" +
      s""""documents_rows":5000,"embeddings_rows":20000,""" +
      s""""canary_q1_rps":510000,"canary_docs_rps":8139,""" +
      s""""canary_emb_rps":3078,"canary_shuffle_rps":612000,""" +
      s""""q1_rows_per_sec":583000,"docs_rows_per_sec":10578,""" +
      s""""emb_rows_per_sec":40123,"healed_reps":0,"index_builds":7,""" +
      s""""prod_variants_total":9.0"""
    // a registry-sized queries map: ~180 rows, far beyond any capture
    val rows = (1 to 180).map(i => s""""q${i}_some_query_name":1.234""")
    val (full, compact, trailer) = Bench.renderLines(
      127.2, scalars, """{"d7_dup_clusters":2}""",
      rows.mkString("{", ",", "}"), "", rows)
    assert(trailer.length < 600, s"trailer must be capture-proof: $trailer")
    assert(compact.length > 1500) // the compact line alone outgrows small captures
    // a 2000-char TAIL capture of the real three-line transcript
    val tail = Seq(full, compact, trailer).mkString("\n").takeRight(2000)
    val lastLine = tail.split('\n').last
    assert(lastLine === trailer) // arrived complete, not beheaded
    val m = Bench.parseCanaries(lastLine, sf)
    assert(m("canary_shuffle_rps") === 612000.0)
    assert(m("q1_rows_per_sec") === 583000.0)
    assert(""""value":(\d+\.\d+)""".r.findFirstMatchIn(lastLine)
      .map(_.group(1).toDouble) === Some(127.2))
    // and the full line (the committed BENCH_FULL.json) still parses
    // for the next round's gate + healing exactly as before
    assert(Bench.parseCanaries(full, sf)("canary_shuffle_rps") === 612000.0)
    assert(Bench.parsePrevMap(full, sf)("q7_some_query_name") === 1.234)
  }

  test("suspect verdict: a mid-suite-degraded end canary convicts at its tier slack") {
    // the r14 driver window in miniature: the start gate passed (all
    // four tiers inside slack vs the record) and contention arrived
    // MID-SUITE — the end re-measure is the only witness. q1/docs
    // convict at 1.5x, emb at 2.25x, shuffle at 2.0x — the same
    // per-tier slack the start gate refuses at.
    val start = Map("q1" -> 500000.0, "docs" -> 8000.0,
                    "emb" -> 3000.0, "shuffle" -> 520000.0)
    def endAt(tier: String, ratio: Double) =
      start.updated(tier, start(tier) / ratio)
    assert(!Bench.suspectEnd(start, start, healedQueries = 0, nOracle = 167))
    assert(Bench.suspectEnd(start, endAt("q1", 1.6), 0, 167))
    assert(!Bench.suspectEnd(start, endAt("q1", 1.4), 0, 167))
    // the shuffle tier tolerates up to 2.0x (exchange-tier variance)...
    assert(!Bench.suspectEnd(start, endAt("shuffle", 1.9), 0, 167))
    assert(Bench.suspectEnd(start, endAt("shuffle", 2.5), 0, 167))
    // ...and emb up to 2.25x (overhead-dominated estimator noise)
    assert(!Bench.suspectEnd(start, endAt("emb", 2.0), 0, 167))
    assert(Bench.suspectEnd(start, endAt("emb", 2.5), 0, 167))
    // an end canary FASTER than start (suite warmed the artifact) never
    // convicts, and a missing tier contributes nothing either way
    assert(!Bench.suspectEnd(start, endAt("docs", 0.5), 0, 167))
    assert(!Bench.suspectEnd(start, start - "shuffle", 0, 167))
    assert(!Bench.suspectEnd(Map.empty, Map.empty, 0, 167))
  }

  test("suspect verdict: runaway healing convicts at the registry-relative bound") {
    // the unit is DISTINCT HEALED QUERIES (r15 advisor: the rep counter
    // silently shifted the threshold with SPARK_GRAFT_HEAL_REPS). r14's
    // contended window healed 21 queries of a 166-entry registry; the
    // healthy record healed 15 against garbage priors — the bound (10%
    // of the registry, min 8) separates exactly these two
    val start = Map("q1" -> 500000.0)
    assert(Bench.suspectEnd(start, start, healedQueries = 21, nOracle = 166))
    assert(!Bench.suspectEnd(start, start, healedQueries = 15, nOracle = 166))
    // the min-8 floor keeps a tiny dev registry from being unconvictable
    assert(Bench.suspectEnd(start, start, healedQueries = 9, nOracle = 10))
    assert(!Bench.suspectEnd(start, start, healedQueries = 8, nOracle = 10))
  }

  test("suspect verdict: sub-slack per-row inflation convicts at >5% of the registry") {
    // the r15 driver window in miniature: every bracket inside its tier
    // slack (end == start here), yet individual registry rows landed
    // 2.3x over the committed record's medians — the per-row clause is
    // the only witness for that shape. 5% of 168 = 8: nine inflated
    // rows convict, eight do not; the tier and healing clauses stay
    // independent (a clean window with zero inflation never convicts).
    val start = Map("q1" -> 500000.0, "docs" -> 8000.0,
                    "emb" -> 3000.0, "shuffle" -> 520000.0)
    assert(Bench.suspectEnd(start, start, 0, 168, inflatedRows = 9))
    assert(!Bench.suspectEnd(start, start, 0, 168, inflatedRows = 8))
    // the min-2 floor for tiny dev registries
    assert(Bench.suspectEnd(start, start, 0, 10, inflatedRows = 3))
    assert(!Bench.suspectEnd(start, start, 0, 10, inflatedRows = 2))
    assert(!Bench.suspectEnd(start, start, 0, 168))
  }

  test("end-canary keys and the suspect flag ride the summary prefix and the trailer") {
    val scalars = s""""unit":"sec","sf":"$sf","lineitem_rows":600572,""" +
      s""""documents_rows":5000,"embeddings_rows":20000,""" +
      s""""canary_q1_rps":510000,"canary_docs_rps":8139,""" +
      s""""canary_emb_rps":3078,"canary_shuffle_rps":612000,""" +
      s""""gate_ref_q1_rps":395348,"gate_ref_shuffle_rps":526540,""" +
      s""""canary_end_q1_rps":495000,"canary_end_docs_rps":8200,""" +
      s""""canary_end_emb_rps":2950,"canary_end_shuffle_rps":590000,""" +
      s""""suspect":false,""" +
      s""""q1_rows_per_sec":583000,"docs_rows_per_sec":10578,""" +
      s""""emb_rows_per_sec":40123,"healed_reps":0,"index_builds":0,""" +
      s""""prod_variants_total":9.0"""
    val rows = (1 to 180).map(i => s""""q${i}_some_query_name":1.234""")
    val (full, _, trailer) = Bench.renderLines(
      145.1, scalars, """{}""", rows.mkString("{", ",", "}"), "", rows)
    // the trailer (the line a tail capture keeps) carries the verdict
    assert(trailer.contains(""""suspect":false"""))
    assert(trailer.contains(""""canary_end_shuffle_rps":590000"""))
    assert(trailer.length < 2000, "trailer must survive the tail capture whole")
    // the start-gate parser is unconfused by the new keys: it still
    // binds the START canary references, not the end re-measures
    assert(Bench.parseCanaries(full, sf)("canary_q1_rps") === 510000.0)
    assert(Bench.parseCanaries(full, sf)("canary_shuffle_rps") === 612000.0)
    // a suspect run's lines point at the sidecar it actually wrote,
    // not at the committed record it deliberately left untouched
    val (_, compactS, trailerS) = Bench.renderLines(
      145.1, scalars, """{}""", rows.mkString("{", ",", "}"), "", rows,
      recordFile = "BENCH_FULL.suspect.json")
    assert(trailerS.contains(""""full_map":"BENCH_FULL.suspect.json""""))
    assert(compactS.contains(""""full_map":"BENCH_FULL.suspect.json""""))
  }

  test("prev map parses the flat queries pairs, including driver-escaped quotes") {
    val r = record("""{"q18_large_orders":0.94,"x_lm_score":1.39}""")
    assert(Bench.parsePrevMap(r, sf) ===
      Map("q18_large_orders" -> 0.94, "x_lm_score" -> 1.39))
    // the driver may embed the line in a log tail with \" escapes
    val escaped = r.replace("\"", "\\\"")
    assert(Bench.parsePrevMap(escaped, sf)("x_lm_score") === 1.39)
  }
}
