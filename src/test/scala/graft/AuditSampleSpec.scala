package graft

import org.apache.spark.sql.functions._
import graft.ext.Dedup
import graft.queries.SimilarityQueries

/** d17 (LSH recall/precision audit) and y13 (cell-balanced diversity
  * subsample) — the invariants their oracles cannot express:
  * completeness of the audit's ground truth against brute-force
  * all-pairs, and the subsample's per-cell cap/occupancy contract
  * under any partitioning. */
class AuditSampleSpec extends SparkTestBase {

  import spark.implicits._

  private def fixtureDocs = {
    // 3 exact-dup clusters + near-dups + unrelated docs; texts long
    // enough to shingle (>= 3 tokens)
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    val docs = Seq(
      (1L, base),
      (2L, base), // exact dup of 1
      (3L, base + " again"), // near dup of 1/2
      (4L, "completely different words about spark catalyst optimizer internals and shuffles"),
      (5L, "completely different words about spark catalyst optimizer internals and shuffles"),
      (6L, "a short unrelated document mentioning rivers and dogs only once here"),
      (7L, "entirely disjoint vocabulary paragraph covering astronomy telescopes and galaxies tonight")
    )
    docs.toDF("doc_id", "text")
  }

  test("d17 ground truth is COMPLETE: n_true equals brute-force all-pairs Jaccard >= 0.8") {
    val docs = fixtureDocs
    val sh = Dedup.shingleFrame(docs)
    // brute force: every unordered pair, exact Jaccard — the quadratic
    // reference the audit's overlap join must reproduce exactly
    val allPairs = sh.select($"doc_id".as("a_id"), $"sh".as("sa"))
      .crossJoin(sh.select($"doc_id".as("b_id"), $"sh".as("sb")))
      .filter($"a_id" < $"b_id")
      .select($"a_id", $"b_id")
    val brute = Dedup.verifyJaccardOnShingles(sh, allPairs, 0.8).count()
    val audit = Dedup.lshRecallAudit(docs, 0.8).head()
    assert(audit.getAs[Long]("n_true") === brute)
    // dup-heavy fixture: at least the two exact-dup pairs qualify
    assert(brute >= 2)
    graft.core.CacheScope.releaseAll()
  }

  test("d17 invariants: found <= true, found <= candidates, ratios consistent") {
    val r = Dedup.lshRecallAudit(fixtureDocs, 0.8).head()
    val (nTrue, nCand, nFound) = (r.getAs[Long]("n_true"),
      r.getAs[Long]("n_candidates"), r.getAs[Long]("n_found"))
    assert(nFound <= nTrue && nFound <= nCand)
    assert(r.getAs[Double]("recall") === nFound.toDouble / nTrue)
    assert(r.getAs[Double]("precision") === nFound.toDouble / nCand)
    // exact dups minhash-collide with certainty -> recall is 1.0 here
    // (every true pair in this fixture shares all four sig chunks)
    assert(r.getAs[Double]("recall") === 1.0)
    graft.core.CacheScope.releaseAll()
  }

  test("d17 on an empty slice returns the vacuous pass, not a division error") {
    val r = Dedup.lshRecallAudit(fixtureDocs.filter($"doc_id" > 100L), 0.8).head()
    assert(r.getAs[Long]("n_docs") === 0L)
    assert(r.getAs[Double]("recall") === 1.0)
    assert(r.getAs[Double]("precision") === 1.0)
    graft.core.CacheScope.releaseAll()
  }

  test("y13 keeps min(m, cell size) per cell and reports true pre-cap occupancy") {
    val dir = sf("sf0.01")
    val kept = SimilarityQueries.cellBalancedSample(spark, dir).persist()
    val perCell = kept.groupBy($"bucket")
      .agg(count(lit(1)).as("n_kept"), max($"n_cell").as("n_cell"),
        min($"n_cell").as("n_cell_min"))
      .collect()
    assert(perCell.nonEmpty)
    perCell.foreach { row =>
      val (nKept, nCell, nCellMin) = (row.getAs[Long]("n_kept"),
        row.getAs[Long]("n_cell"), row.getAs[Long]("n_cell_min"))
      assert(nCell === nCellMin) // occupancy consistent across rows
      assert(nKept === math.min(8L, nCell))
    }
    // kept ids are a subset of the corpus
    val corpus = graft.sources.Tables(spark, dir).embeddings.select("vec_id")
    assert(kept.select("vec_id").except(corpus).count() === 0L)
    kept.unpersist()
  }

  test("y13 re-executes to the same kept set (md5 rank is partition-independent)") {
    val dir = sf("sf0.01")
    val a = SimilarityQueries.cellBalancedSample(spark, dir)
    // second, independent execution with a different final partitioning —
    // the pick key is a pure function of vec_id, so the per-cell top-m is
    // the same set no matter how rows were distributed when ranked
    val b = SimilarityQueries.cellBalancedSample(spark, dir).repartition(7)
    assert(a.except(b).count() === 0L)
    assert(b.except(a).count() === 0L)
  }
}
