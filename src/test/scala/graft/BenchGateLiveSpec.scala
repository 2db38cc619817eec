package graft

/** Live smoke of the mint gate (r13 verdict #1): the r13 driver window
  * minted a 2.2x-degraded artifact because all three canaries were
  * scan/hash-shaped — the shuffle tier (q_cube: Expand + exchange) now
  * gates independently, and this suite actually RUNS the gate's canary
  * executions against sf0.001 to pin both verdicts end to end. */
class BenchGateLiveSpec extends SparkTestBase {

  private def measured = scala.collection.mutable.LinkedHashMap.empty[String, Double]

  test("a contended-shuffle window refuses to mint") {
    // a record whose shuffle canary ran 1e12 rows/s is indistinguishable
    // (to the gate) from a healthy record measured on a host this box is
    // now >>2x slower than — the exact r13 blind spot, which the three
    // scan/hash canaries could not see. docs/emb rows = 0 keeps the
    // smoke on the two lineitem canaries.
    val m = measured
    val refusal = Bench.runGate(spark, sf(), liRows = 6005, docRows = 0,
      embRows = 0, record = Map("canary_shuffle_rps" -> 1e12), measured = m)
    assert(refusal.isDefined, "an absurd shuffle record must refuse the mint")
    assert(refusal.get.contains(""""canary":"shuffle""""))
    assert(refusal.get.contains(""""degraded":true"""))
    // the q1 tier measured fine (no record key -> no gating) and its
    // canary-state measurement was still collected for the record
    assert(m.contains("canary_q1_rps") && m("canary_q1_rps") > 0)
  }

  test("a healthy window measures all armed tiers and mints") {
    val m = measured
    val refusal = Bench.runGate(spark, sf(), liRows = 6005, docRows = 0,
      embRows = 0, record = Map("canary_shuffle_rps" -> 1.0), measured = m)
    assert(refusal.isEmpty, "a trivially-slow record must pass")
    assert(m.contains("canary_shuffle_rps") && m("canary_shuffle_rps") > 0)
    assert(m.contains("canary_q1_rps"))
  }
}
