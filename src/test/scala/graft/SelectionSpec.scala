package graft

import org.apache.spark.sql.functions._
import graft.queries.{DedupQueries, SelectionQueries}

/** Semantic checks on the data-selection tier and the cross-source
  * representative rule — the properties the oracles can't state
  * directly (fractions per group, budget arithmetic, priority wins). */
class SelectionSpec extends SparkTestBase {

  test("x_quality_topp keeps exactly floor(0.3·n) docs per source") {
    val kept = SelectionQueries.qualityTopP(spark, sf())
      .groupBy(col("source")).agg(count(lit(1)).as("k"))
    val sizes = graft.sources.Tables(spark, sf()).documents
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
    val bad = kept.join(sizes, "source")
      .filter(col("k") =!= expr("(n * 3) div 10")).count()
    assert(bad === 0)
  }

  test("x_token_budget: first doc of every source survives; every kept doc starts under budget") {
    val docs = graft.sources.Tables(spark, sf()).documents
    val nSources = docs.select(col("source")).distinct().count()
    val kept = SelectionQueries.tokenBudget(spark, sf(), budget = 500L)
    // one doc per source starts at offset 0 (cum == n_tok) — always kept
    assert(kept.filter(col("cum") === col("n_tok")).count() === nSources)
    assert(kept.filter(col("cum") - col("n_tok") >= 500L).count() === 0)
    // determinism: same selection on a re-run
    val again = SelectionQueries.tokenBudget(spark, sf(), budget = 500L)
    assert(kept.select("doc_id").except(again.select("doc_id")).count() === 0)
  }

  test("x_ppl_buckets: per language, tercile sizes differ by at most 1") {
    val counts = SelectionQueries.pplBuckets(spark, sf())
      .groupBy(col("lang"), col("bucket")).agg(count(lit(1)).as("n"))
      .groupBy(col("lang"))
      .agg(max(col("n")).as("mx"), min(col("n")).as("mn"),
        count(lit(1)).as("n_buckets"))
      .collect()
    counts.foreach { r =>
      assert(r.getAs[Long]("mx") - r.getAs[Long]("mn") <= 1,
        s"uneven terciles for ${r.get(0)}")
    }
  }

  test("x_dsir_weights scores English docs above the rest on average") {
    val docs = graft.sources.Tables(spark, sf()).documents
      .select(col("doc_id"), col("lang"))
    val m = SelectionQueries.dsirWeights(spark, sf()).join(docs, "doc_id")
      .groupBy(col("lang") === "en").agg(avg(col("dsir_score")).as("s"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(m(true) > m(false),
      s"target slice not upweighted: en=${m(true)} rest=${m(false)}")
  }

  test("d18 keeps the highest-priority source's member, ties by min id") {
    import spark.implicits._
    val docs = Seq(
      (1L, "cc"), (2L, "wiki"), (3L, "cc"),   // cluster A: wiki wins
      (4L, "cc"), (5L, "cc"),                 // cluster B: min id within cc
      (6L, "news")                            // unclustered: absent from output
    ).toDF("doc_id", "source")
    val clusters = Seq(
      (1L, 1L), (2L, 1L), (3L, 1L),
      (4L, 4L), (5L, 4L)
    ).toDF("doc_id", "cluster_id")
    val prio = Seq(("wiki", 1L), ("news", 2L), ("cc", 3L))
      .toDF("source", "prio")
    val out = graft.ext.Curation.clusterBySource(docs, clusters, prio)
      .orderBy(col("cluster_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq === Seq(
      (1L, 2L, "wiki", 1L, 3L),
      (4L, 4L, "cc", 3L, 2L)))
  }

  test("x_split_leakproof: no cluster straddles splits, near-dup pairs co-split, fractions hold") {
    val split = graft.queries.SelectionQueries.splitByCluster(spark, sf())
      .persist()
    try {
      // the guarantee: split is a function of cluster_id
      val straddling = split.groupBy(col("cluster_id"))
        .agg(countDistinct(col("split")).as("n"))
        .filter(col("n") > 1).count()
      assert(straddling === 0L)
      // stronger, via the verified near-dup PAIRS: both ends co-split
      val pairs = DedupQueries.neardupPairs(spark, sf())
        .select(col("a_id"), col("b_id"))
      val a = split.select(col("doc_id").as("a_id"), col("split").as("sa"))
      val b = split.select(col("doc_id").as("b_id"), col("split").as("sb"))
      val crossSplit = pairs.join(a, "a_id").join(b, "b_id")
        .filter(col("sa") =!= col("sb")).count()
      assert(crossSplit === 0L, "a near-dup pair straddles the split")
      // realized fractions: cluster-size-weighted 80/10/10; the corpus
      // is 500 docs so the band is wide but a swapped CASE arm or a
      // biased bucket would blow it
      val n = split.count().toDouble
      val byS = split.groupBy("split").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(byS("train") / n > 0.70 && byS("train") / n < 0.90, s"$byS")
      assert(byS.getOrElse("val", 0L) / n < 0.20 && byS.getOrElse("test", 0L) / n < 0.20, s"$byS")
    } finally split.unpersist()
  }

  test("d18 registration agrees with composing the library pieces") {
    val viaQuery = DedupQueries.crossSourceDedup(spark, sf())
    val docs = graft.sources.Tables(spark, sf()).documents
    val prio = docs.select(col("source")).distinct()
      .withColumn("prio", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("source")))
        .cast("long"))
    val viaLib = graft.ext.Curation.clusterBySource(
      docs, DedupQueries.dupClusters(spark, sf()), prio)
    assert(viaQuery.except(viaLib).count() === 0)
    assert(viaLib.except(viaQuery).count() === 0)
  }
}
