package graft

import org.apache.spark.sql.functions._

/** The quantile-sketch twin's contract (q_price_quantiles_*,
  * prodVariants): Greenwald-Khanna guarantees RANK error, not value
  * error — for each reported quantile v of a group of n rows,
  * |rank(v)/n - q| <= eps (eps = 1/accuracy = 1e-3) — checked against
  * the in-JVM exact distribution, since a continuous domain has no
  * hash-stable cross-engine oracle. Plus the plan pin that is the
  * sketch's reason to exist: a map-side partial_approx_percentile so
  * the exchange carries fixed-size summaries, with ONE hash exchange
  * keyed by the group column, never the rows themselves. */
class QuantileSketchSpec extends SparkTestBase {

  private val eps = 1e-3 // accuracy = 1000 in priceQuantiles

  test("sketch quantiles satisfy the GK rank-error contract per group") {
    val sketch = graft.queries.RelationalQueries
      .priceQuantiles(spark, sf(), exact = false)
      .collect()
      .map(r => r.getString(0) ->
        ((Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3)), r.getLong(4))))
      .toMap
    // exact per-group distributions, small at sf0.001 (1.5k orders)
    val groups = graft.sources.Tables(spark, sf()).orders
      .select(col("o_orderpriority"), col("o_totalprice"))
      .collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sorted }
    assert(sketch.keySet === groups.keySet)
    for ((prio, (qs, n)) <- sketch) {
      val sortedVals = groups(prio)
      assert(n === sortedVals.length.toLong)
      for ((v, q) <- qs.zip(Seq(0.25, 0.5, 0.75))) {
        val rank = sortedVals.count(_ <= v).toDouble
        // +1/n slack: ranks are integers, the ideal rank q*n is not
        val err = math.abs(rank / n - q)
        assert(err <= eps + 1.0 / n,
          s"$prio q=$q: value $v has rank $rank of $n, rank error $err")
      }
      assert(qs == qs.sorted, s"$prio: quartiles must be monotone: $qs")
    }
  }

  test("the sketch plan partial-aggregates map-side (summaries on the wire)") {
    val plan = graft.queries.RelationalQueries
      .priceQuantiles(spark, sf(), exact = false)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_approx_percentile"),
      s"expected a map-side GK partial:\n$plan")
    assert(plan.contains("hashpartitioning(o_orderpriority#") &&
      "hashpartitioning".r.findAllIn(plan).length == 1,
      s"sketch plan must have exactly ONE hash exchange, keyed by the group:\n$plan")
    // the exact form's plan SHAPE is identical (percentile is also a
    // partial-merged ObjectHashAggregate) — the difference this pair
    // exists for is the aggregation STATE: a counts-map entry per
    // distinct value (group-sized on this continuous column) vs the
    // eps-bounded summary. Pin that the exact form really does carry
    // the value map so the scaladoc's claim stays true under upgrades.
    val exactPlan = graft.queries.RelationalQueries
      .priceQuantiles(spark, sf(), exact = true)
      .queryExecution.executedPlan.toString
    assert(exactPlan.contains("partial_percentile"),
      s"exact form no longer plans value-map percentile:\n$exactPlan")
  }
}
