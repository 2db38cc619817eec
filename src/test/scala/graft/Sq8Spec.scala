package graft

import graft.queries.SimilarityQueries

/** SQ8 quantization quality: the asymmetric-dequantized ranking must
  * agree with exact cosine almost everywhere — 8 bits per dimension
  * against per-dim corpus range keeps relative component error ≤
  * 1/255, far under the fixture's neighbor separation. */
class Sq8Spec extends SparkTestBase {

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("probe_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("SQ8 top-10 recall vs exact cosine") {
    val exact = pairs(SimilarityQueries.cosineTopK(spark, sf()))
    val sq8 = pairs(SimilarityQueries.sq8TopK(spark, sf()))
    graft.core.CacheScope.releaseAll()
    val recall = (exact & sq8).size.toDouble / exact.size
    info(f"recall@10 = $recall%.3f (${exact.size} exact pairs)")
    assert(recall >= 0.9, f"SQ8 recall collapsed: $recall%.3f")
  }

  test("SQ8 ranking is deterministic across runs") {
    val a = SimilarityQueries.sq8TopK(spark, sf()).collect().toSeq
    graft.core.CacheScope.releaseAll()
    val b = SimilarityQueries.sq8TopK(spark, sf()).collect().toSeq
    graft.core.CacheScope.releaseAll()
    assert(a === b)
  }
}
