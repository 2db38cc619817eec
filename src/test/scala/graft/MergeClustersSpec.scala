package graft

import graft.ext.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental cluster maintenance (Dedup.mergeIntoClusters): folding a
  * new batch of verified pairs into a standing (doc_id, cluster_id)
  * labeling must equal a from-scratch connected-components run over the
  * combined pair graph, while the merge's CC input stays bounded by
  * |labels| + |new pairs| — never the corpus pair count.
  */
class MergeClustersSpec extends SparkTestBase {
  import spark.implicits._

  private def ccOf(pairs: Seq[(Long, Long)]): DataFrame =
    Dedup.connectedComponents(pairs.toDF("a_id", "b_id"))

  private def asMap(df: DataFrame): Map[Long, Long] =
    df.select(col("doc_id"), col("cluster_id")).as[(Long, Long)]
      .collect().toMap

  // standing graph: a DENSE 6-clique (old pipeline verified all 15
  // pairs), a triangle, and a 2-cluster
  private val oldPairs: Seq[(Long, Long)] =
    (for { a <- 0L until 6L; b <- (a + 1) until 6L } yield (a, b)) ++
    Seq((10L, 11L), (11L, 12L), (20L, 21L))

  test("merge covers extension, bridging, and brand-new components — equal to from-scratch") {
    val labels = ccOf(oldPairs).persist()
    // new batch: extends the clique (100-0), bridges triangle and
    // 2-cluster (12-20), creates a fresh component (30-31), and one
    // isolated self-contained chain (40-41, 41-42)
    val newPairs = Seq((100L, 0L), (12L, 20L), (30L, 31L),
      (40L, 41L), (41L, 42L)).toDF("a_id", "b_id")
    val merged = asMap(Dedup.mergeIntoClusters(labels, newPairs))
    val scratch = asMap(ccOf(oldPairs ++ Seq((100L, 0L), (12L, 20L),
      (30L, 31L), (40L, 41L), (41L, 42L))))
    assert(merged === scratch)
    // spot semantics: bridge united the triangle and pair under min 10;
    // the clique absorbed 100 under min 0; untouched labels unchanged
    assert(merged(20L) === 10L && merged(21L) === 10L && merged(12L) === 10L)
    assert(merged(100L) === 0L && merged(5L) === 0L)
    assert(merged(30L) === 30L && merged(31L) === 30L)
    labels.unpersist()
    graft.core.CacheScope.releaseAll()
  }

  test("merge input is star-forest-sized: |labels| + |newPairs| edges, not the old pair count") {
    // the dense 6-clique contributed 15 pairs to the original run but
    // exactly 6 star edges to the merge — the compression that makes
    // the merge corpus-independent (a c-member cluster is c edges
    // however dense its pair graph was)
    val labels = ccOf(oldPairs).persist()
    val starEdges = labels.count()
    assert(starEdges === 11L) // 6 + 3 + 2 vertices
    assert(oldPairs.size === 18) // 15 + 2 + 1 pairs
    assert(starEdges + 1 < oldPairs.size + 1,
      "star forest must be smaller than a dense pair graph")
    labels.unpersist()
    graft.core.CacheScope.releaseAll()
  }

  test("idempotent fixed point: merging an empty batch reproduces the labeling") {
    val labels = ccOf(oldPairs).persist()
    val empty = Seq.empty[(Long, Long)].toDF("a_id", "b_id")
    assert(asMap(Dedup.mergeIntoClusters(labels, empty)) === asMap(labels))
    labels.unpersist()
    graft.core.CacheScope.releaseAll()
  }

  test("repeated ingests maintain the star-forest invariant round over round") {
    // three successive merges, each consuming the previous OUTPUT as the
    // standing labels — the deployment loop. Every round's output must
    // match from-scratch CC over everything seen so far.
    val batches = Seq(
      Seq((50L, 51L)),                 // new component
      Seq((51L, 0L)),                  // bridge it into the clique
      Seq((52L, 50L), (20L, 52L)))     // chain through, pulling in 20-21
    var labels = ccOf(oldPairs).persist()
    var seen = oldPairs
    batches.foreach { b =>
      val next = Dedup.mergeIntoClusters(labels, b.toDF("a_id", "b_id")).persist()
      next.count()
      labels.unpersist()
      seen = seen ++ b
      assert(asMap(next) === asMap(ccOf(seen)),
        s"round with batch $b diverged from from-scratch CC")
      labels = next
    }
    labels.unpersist()
    graft.core.CacheScope.releaseAll()
  }

  test("delta form: labels upserted by mergeIntoClustersDelta equal mergeIntoClusters") {
    // the merge-on-read publish contract: the CHANGED-rows frame, laid
    // over the standing labels by doc_id, reconstructs the full-rewrite
    // output row for row — and stays ingest-sized (no unchanged
    // standing rows ride along)
    val labels = ccOf(oldPairs).persist()
    val newPairs = Seq((100L, 0L), (12L, 20L), (30L, 31L),
      (40L, 41L), (41L, 42L)).toDF("a_id", "b_id")
    val full = asMap(Dedup.mergeIntoClusters(labels, newPairs))
    val delta = asMap(Dedup.mergeIntoClustersDelta(labels, newPairs))
    assert(asMap(labels) ++ delta === full,
      "standing labels overridden by the delta must equal the full merge")
    // size contract: the clique's unchanged members (min id 0 keeps its
    // label; 1..5 unchanged) must NOT appear; the bridged triangle+pair
    // members relabel to 10, so 20/21 appear; every new doc appears
    assert(!delta.contains(1L) && !delta.contains(5L),
      "unchanged standing rows must not inflate the delta")
    assert(delta(20L) === 10L && delta(21L) === 10L)
    assert(Seq(100L, 30L, 31L, 40L, 41L, 42L).forall(delta.contains))
    // an all-known batch produces an EMPTY delta (the skip-append case)
    assert(Dedup.mergeIntoClustersDelta(labels,
      Seq((0L, 1L)).toDF("a_id", "b_id")).isEmpty,
      "a connectivity-no-op batch must yield no changed rows")
    labels.unpersist()
    graft.core.CacheScope.releaseAll()
  }

  test("registered d14 equals a from-scratch d7 over the combined corpus") {
    val dir = "/root/testdata/sf0.001"
    val d14 = asMap(queries.DedupQueries.incrementalClusters(spark, dir))
    graft.core.CacheScope.releaseAll()
    val d7 = asMap(queries.DedupQueries.dupClusters(spark, dir))
    graft.core.CacheScope.releaseAll()
    assert(d14 === d7)
  }
}
