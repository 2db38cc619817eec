package graft

import org.apache.spark.sql.functions._

/** The HLL cardinality twin's contract: the sketch answer tracks the
  * exact distinct within its declared error, the sketch-free `tokens`
  * column agrees EXACTLY, and the plan does the thing the sketch is
  * for — a map-side partial_approx_count_distinct so the exchange
  * carries sketches, not the vocabulary. */
class VocabSketchSpec extends SparkTestBase {

  private lazy val exact = graft.queries.AnalysisQueries
    .vocabBySource(spark, sf(), exact = true)
    .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
  private lazy val hll = graft.queries.AnalysisQueries
    .vocabBySource(spark, sf(), exact = false)
    .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("HLL vocab tracks exact within 3x the declared rsd, ngrams agree exactly") {
    assert(hll.keySet === exact.keySet)
    for ((src, (v, tok)) <- exact) {
      val (vh, tokH) = hll(src)
      assert(tokH === tok, s"$src: ngrams must be sketch-free identical")
      val relErr = math.abs(vh - v).toDouble / v
      // rsd 0.02; 3x = 6% absorbs the small-cardinality regime at
      // sf0.001 while still failing loud on a broken sketch
      assert(relErr <= 0.06, s"$src: |$vh - $v|/$v = $relErr > 0.06")
    }
  }

  test("the sketch plan partial-aggregates map-side (one exchange, sketches on the wire)") {
    val plan = graft.queries.AnalysisQueries
      .vocabBySource(spark, sf(), exact = false)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_approx_count_distinct"),
      s"expected a map-side HLL partial:\n$plan")
    // exactly ONE hash exchange, keyed by source alone — the sketch
    // plan's shuffle rows are (source, MS[...] sketch words). The
    // exact form needs a (source, t)-keyed pre-aggregation exchange
    // first (vocabulary-sized), so it carries strictly more exchanges.
    assert(plan.contains("hashpartitioning(source#") &&
      "hashpartitioning".r.findAllIn(plan).length == 1,
      s"sketch plan must have exactly ONE hash exchange, keyed by source:\n$plan")
    val exactPlan = graft.queries.AnalysisQueries
      .vocabBySource(spark, sf(), exact = true)
      .queryExecution.executedPlan.toString
    val dataExchanges = "hashpartitioning".r.findAllIn(plan).length
    val exactExchanges = "hashpartitioning".r.findAllIn(exactPlan).length
    assert(dataExchanges < exactExchanges,
      s"sketch must shuffle strictly less: $dataExchanges vs $exactExchanges")
  }
}
