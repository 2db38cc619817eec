package graft

import org.apache.spark.sql.DataFrame

/** Results must not depend on how the data is partitioned — the
  * property that makes a query's answer stable across cluster sizes,
  * retries, and AQE re-plans at 100 TB. Exercises the queries whose
  * implementations aggregate in partition-dependent ORDER if written
  * naively (float sums, multiplicative checksums, iterative label
  * propagation, bounded-heap top-k): each runs under two different
  * shuffle-partition counts and must produce identical rows.
  */
class PartitionInvarianceSpec extends SparkTestBase {

  private val watched = Seq(
    "x_group_checksum",   // order-independent mod-2^64 product
    "y5_label_centroids", // exact int64 component sums
    "d7_dup_clusters",    // iterative CC over a shuffled pair graph
    "q_topk_per_key",     // bounded-heap partial/final execs
    "q1_pricing_summary", // decimal aggregation
    "x_mixture_weights",  // int64 -> double ratio chain
    "x_lm_score",         // quantized-int probability sums
    "y8_semantic_dedup",  // k-means + within-cell anti-join
    "a11_funnel",         // collect_list order varies per partitioning;
                          // the min-chain must not see it
    "q21_sole_late_supplier") // conditional countDistinct pair + top-10

  private def rows(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted
    df.collect().map(r => cols.map(c =>
      String.valueOf(r.get(r.fieldIndex(c)))).mkString("|")).toSeq.sorted
  }

  test("watched queries return identical rows at 3 and 13 shuffle partitions") {
    for (q <- watched) {
      def run(parts: Int): Seq[String] = {
        spark.conf.set("spark.sql.shuffle.partitions", parts)
        try rows(SparkEntry.queries(q)(spark, sf()))
        finally {
          graft.core.CacheScope.releaseAll()
          spark.catalog.clearCache()
          spark.conf.set("spark.sql.shuffle.partitions", 4)
        }
      }
      val a = run(3)
      val b = run(13)
      assert(a.nonEmpty, s"$q returned nothing")
      assert(a === b, s"$q result depends on shuffle partitioning")
    }
  }
}
