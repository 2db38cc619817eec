package graft

import graft.ext.{CountMin, Dedup}
import graft.queries.AnalysisQueries
import org.apache.spark.sql.functions._

/** The count-min contract behind x_heavy_shingles: estimates never
  * undercount (complete recall for the >= T screen), the screen
  * genuinely admits collision false positives at this sketch width
  * (i.e. the exact verify pass is load-bearing, not decorative), and
  * the final answer is hash-mode-invariant. */
class CountMinSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val occ = Dedup.shingleFrame(
      graft.sources.Tables(spark, sf()).documents)
    .select(explode_outer(col("sh")).as("ng"))
    .filter(col("ng").isNotNull)
    .persist()

  private lazy val exact: Map[String, Long] = occ.groupBy(col("ng"))
    .agg(count(lit(1)).as("df")).as[(String, Long)].collect().toMap

  test("estimates never undercount — the complete-recall precondition") {
    for (mode <- Seq("md5", "xxh64")) {
      val sketch = CountMin.build(occ, mode)
      val ests = CountMin.stagedEstimate(occ.distinct(), sketch, mode)
        .as[(String, Long)].collect()
      assert(ests.nonEmpty)
      ests.foreach { case (ng, est) =>
        assert(est >= exact(ng), s"[$mode] undercount for '$ng': $est < ${exact(ng)}")
      }
    }
  }

  test("the screen admits false positives at this width — the verify pass is load-bearing") {
    // ~16.5k distinct shingles in 4 x 8192 counters: collisions must
    // inflate some below-threshold shingle over the line. If this ever
    // fails, the fixture stopped exercising the screen and the
    // registration would be a vacuous demo.
    val sketch = CountMin.build(occ, "md5")
    val fp = CountMin.stagedEstimate(occ.distinct(), sketch, "md5")
      .as[(String, Long)].collect()
      .count { case (ng, est) => est >= 5L && exact(ng) < 5L }
    assert(fp > 0, "no collision false positives — screen untested")
  }

  test("heavy-shingles output equals the exact HAVING, in both hash modes") {
    // the registration's fractional threshold, derived the same way
    val t = math.ceil(0.01 *
      graft.sources.Tables(spark, sf()).documents.count()).toLong
    val expected = exact.filter(_._2 >= t)
    for (mode <- Seq("md5", "xxh64")) {
      val got = AnalysisQueries.heavyShingles(spark, sf(), mode)
        .as[(String, Long)].collect().toMap
      assert(got === expected, s"[$mode] screen changed the answer")
    }
  }
}
