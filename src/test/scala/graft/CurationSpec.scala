package graft

import org.apache.spark.sql.Row
import graft.ext.{Curation, CurationConfig}
import graft.queries.{AnalysisQueries, DedupQueries}
import graft.sources.Tables

/** The composable curation entry point (graft.ext.Curation): the
  * one-call API must equal the oracle-checked registrations it
  * composes, its skew and representative dials must behave per their
  * contracts, and the config must reject nonsense early. */
class CurationSpec extends SparkTestBase {

  private def docs = Tables(spark, sf()).documents

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Row] = {
    val cols = df.columns.sorted.map(org.apache.spark.sql.functions.col)
    df.select(cols.toSeq: _*).collect().toSet
  }

  test("curate() at the default config equals the x_curate_pack registration") {
    val api = Curation.curate(docs)
    val registered = AnalysisQueries.curatePack(spark, sf())
    assert(rows(api) === rows(registered))
    assert(api.count() > 0)
  }

  test("curateWith a pre-computed cluster frame equals the one-call form") {
    val cl = Curation.clusters(docs).persist()
    try {
      assert(rows(Curation.curateWith(docs, cl)) === rows(Curation.curate(docs)))
    } finally cl.unpersist()
  }

  test("curateWithMetrics: same output, and the free counters reconcile") {
    val cl = Curation.clusters(docs).persist()
    try {
      val (observed, oIn, oDedup, oOut) = Curation.curateWithMetrics(docs, cl)
      val got = rows(observed) // the ONE action the observations need
      assert(got === rows(Curation.curateWith(docs, cl)),
        "observe points must not change the result")
      val in = oIn.get; val dd = oDedup.get; val out = oOut.get
      assert(in("docs") === docs.count(), "input counter = the corpus")
      assert(dd("survivors") === Curation.applyCanonical(docs, cl).count())
      assert(out("kept") === got.size.toLong, "output counter = packed rows")
      // conservation: dedup can only drop, the gate can only drop more
      assert(in("docs").asInstanceOf[Long] >= dd("survivors").asInstanceOf[Long])
      assert(dd("survivors").asInstanceOf[Long] >= out("kept").asInstanceOf[Long])
      // survivors REPRESENT the whole deduped corpus (absorbed dups included)
      assert(dd("docs_represented") === in("docs"))
      assert(out("tokens_kept").asInstanceOf[Long] <= in("tokens").asInstanceOf[Long])
    } finally cl.unpersist()
  }

  test("salt-split skew mode is output-invariant through the WHOLE pipeline") {
    // maxBucket=2 forces real splitting at this sf (3-doc cluster
    // buckets get g=2 sub-buckets) — output must still equal unguarded
    val salted = Curation.curate(docs,
      CurationConfig(skewMode = "salt", maxBucket = 2))
    assert(rows(salted) === rows(Curation.curate(docs)))
  }

  test("best-representative survivors preserve count and mass, differ in ids") {
    val cl = Curation.clusters(docs).persist()
    try {
      val canonical = Curation.applyCanonical(docs, cl)
      val best = Curation.applyBest(docs, cl)
      val nDocs = docs.count()
      // same survivor count and the same n_merged conservation: each
      // cluster keeps exactly one member carrying the full member count
      assert(canonical.count() === best.count())
      def mass(df: org.apache.spark.sql.DataFrame): Long =
        df.agg(org.apache.spark.sql.functions.sum("n_merged")).head.getLong(0)
      assert(mass(canonical) === nDocs)
      assert(mass(best) === nDocs)
      // the registered d13 form is the same code path
      assert(rows(best) === rows(DedupQueries.dedupApplyBestOn(docs, cl)))
    } finally cl.unpersist()
  }

  test("curate(best, salted) matches the x_curate_best registration") {
    val cfg = CurationConfig(representative = "best", skewMode = "salt",
      maxBucket = 2)
    assert(rows(Curation.curate(docs, cfg)) ===
      rows(SparkEntry.queries("x_curate_best")(spark, sf())))
  }

  test("curateIncremental equals from-scratch curate on the combined corpus") {
    import org.apache.spark.sql.functions.col
    // the d14 fixture: corpus = 4/5 of docs (indexed), batch = the rest
    val corpusDocs = docs.filter(col("doc_id") % 5 =!= 0)
    val batch = docs.filter(col("doc_id") % 5 === 0)
    val idx = java.nio.file.Files.createTempDirectory("curinc").toString + "/idx"
    graft.ext.Dedup.writeNeardupIndex(corpusDocs, idx)
    val standing = Curation.clusters(corpusDocs).persist()
    try {
      val incremental = Curation.curateIncremental(corpusDocs, standing,
        batch, idx)
      assert(rows(incremental) === rows(Curation.curate(docs)))
    } finally standing.unpersist()
  }

  test("multi-batch operational loop: labels carried forward, index appended") {
    import org.apache.spark.sql.functions.col
    // day 0: first third is the standing corpus; days 1 and 2 each
    // ingest another third through the documented loop — screen, merge
    // labels, curate, then append the batch to the index and persist
    // the returned labels as tomorrow's standing labels
    val c0 = docs.filter(col("doc_id") % 3 === 0)
    val b1 = docs.filter(col("doc_id") % 3 === 1)
    val b2 = docs.filter(col("doc_id") % 3 === 2)
    val idx = java.nio.file.Files.createTempDirectory("curloop").toString + "/idx"
    graft.ext.Dedup.writeNeardupIndex(c0, idx)
    val labels0 = Curation.clusters(c0).persist()
    try {
      val labels1 = Curation.incrementalLabels(labels0, b1, idx).persist()
      graft.ext.Dedup.appendToNeardupIndex(b1, idx)
      try {
        val day2 = Curation.curateIncremental(c0.unionByName(b1), labels1,
          b2, idx)
        assert(rows(day2) === rows(Curation.curate(docs)))
      } finally labels1.unpersist()
    } finally labels0.unpersist()
  }

  test("curateIncremental fails loudly at the API edge on a batch schema mismatch") {
    import org.apache.spark.sql.functions.{col, lit}
    val extra = docs.withColumn("source_url", lit("x"))
    val e = intercept[IllegalArgumentException](
      Curation.curateIncremental(docs, docs.select(col("doc_id"),
        col("doc_id").as("cluster_id")), extra, "/nonexistent"))
    assert(e.getMessage.contains("source_url"),
      s"the error must name the offending column set: ${e.getMessage}")
  }

  test("curateIncremental rejects a non-md5 hash mode") {
    intercept[IllegalArgumentException](
      Curation.curateIncremental(docs, docs, docs, "/nonexistent",
        CurationConfig(hashMode = "xxh64")))
  }

  test("config rejects invalid dials eagerly") {
    intercept[IllegalArgumentException](CurationConfig(skewMode = "shrug"))
    intercept[IllegalArgumentException](CurationConfig(representative = "worst"))
    intercept[IllegalArgumentException](CurationConfig(skewMode = "salt")) // needs maxBucket
    intercept[IllegalArgumentException](CurationConfig(minTokens = 10, maxTokens = 5))
    intercept[IllegalArgumentException](CurationConfig(minJaccard = 1.5))
    intercept[IllegalArgumentException](CurationConfig(nShards = 0))
  }
}
