package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.Dedup
import graft.sources.Tables

/** Where does d14b_merge_pre's time go? Stage-by-stage wall clock over
  * the committed fixtures at a given sf dir: standing-label read,
  * batch shingle+signatures, batch-internal pairs, cross band-join +
  * verify, and the mergeIntoClusters CC — so the "sub-second d14b"
  * question is answered with a measurement instead of a guess.
  * Usage: runMain graft.tools.ProbeMergeCost [sfDir]
  */
object ProbeMergeCost {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[mergecost] $what: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // fixtures pre-built (untimed), mirroring the bench contract
    graft.SparkEntry.prepareFixturesFor(spark, dir, Set("d14b_merge_pre"))
    (1 to 3).foreach { rep =>
      println(s"[mergecost] --- rep $rep ---")
      val docs = Tables(spark, dir).documents
      val index = t("index read (committed)") {
        val i = Dedup.readNeardupIndex(spark,
          graft.core.IndexStore.pathFor(spark, "neardup-index", dir))
        i.count(); i
      }
      val labels = t("standing labels read") {
        val l = spark.read.parquet(
          graft.core.IndexStore.pathFor(spark, "idx-labels", dir))
        l.count(); l
      }
      val bsh = t("batch shingle") {
        val s = Dedup.shingleFrame(docs.filter(col("doc_id") % 5 === 0)).persist()
        s.count(); s
      }
      val bSigs = t("batch signatures") {
        val s = Dedup.signaturesFromShingles(bsh).persist()
        s.count(); s
      }
      val batchPairs = t("batch-internal pairs (cand+verify)") {
        val p = Dedup.verifyJaccardOnShingles(bsh,
            Dedup.candidatePairs(bSigs), 0.8)
          .select(col("a_id"), col("b_id")).persist()
        p.count(); p
      }
      val crossPairs = t("cross band-join + verify") {
        val bBands = bSigs.select(col("doc_id").as("batch_id"),
          posexplode(array(col("band0"), col("band1")))
            .as(Seq("band_idx", "band_hash")))
        val iBands = index.select(col("doc_id").as("corpus_id"),
          posexplode(array(col("band0"), col("band1")))
            .as(Seq("band_idx_b", "band_hash_b")))
        val cand = bBands.join(iBands,
            col("band_idx") === col("band_idx_b") &&
            col("band_hash") === col("band_hash_b"))
          .select(col("batch_id"), col("corpus_id")).distinct()
        val p = Dedup.verifyJaccardAcross(bsh,
            index.select(col("doc_id"), col("sh")), cand, 0.8,
            "batch_id", "corpus_id")
          .select(col("batch_id").as("a_id"), col("corpus_id").as("b_id"))
          .persist()
        p.count(); p
      }
      t("mergeIntoClusters (CC-star)") {
        Dedup.mergeIntoClusters(labels, batchPairs.union(crossPairs))
          .write.format("noop").mode("overwrite").save()
      }
      Seq(bsh, bSigs, batchPairs, crossPairs).foreach(_.unpersist())
      graft.core.CacheScope.releaseAll()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
