package graft

import org.apache.spark.sql.functions._
import graft.agg.ModProduct

/** The custom Aggregator surface (SURVEY.md §2.9): product mod 2^64 as
  * a typed Aggregator registered via udaf — partition-independence (the
  * property that makes it a valid distributed checksum), SQL-surface
  * registration, and agreement with the fold reference.
  */
class ModProductSpec extends SparkTestBase {
  import spark.implicits._

  private val xs: Seq[Long] = Seq(3L, -7L, 0x7fffffffffffffffL, 101L, 31L, -1L)

  test("checksum is independent of row order and partitioning") {
    val expect = ModProduct.reference(xs)
    for (parts <- Seq(1, 3, 7); seed <- Seq(1, 2)) {
      val shuffled = new scala.util.Random(seed).shuffle(xs)
      val got = shuffled.toDS().repartition(parts)
        .agg(ModProduct.product_mod64(col("value"))).as[Long].collect()(0)
      assert(got === expect, s"parts=$parts seed=$seed")
    }
  }

  test("registers as a SQL aggregate and groups correctly") {
    spark.udf.register("product_mod64", udaf(ModProduct))
    Seq(("a", 3L), ("a", 5L), ("b", 7L), ("b", -11L), ("b", 13L))
      .toDF("k", "v").createOrReplaceTempView("mp_in")
    val got = spark.sql(
      "SELECT k, product_mod64(v) AS c FROM mp_in GROUP BY k ORDER BY k")
      .as[(String, Long)].collect().toSeq
    assert(got === Seq("a" -> 15L, "b" -> ModProduct.reference(Seq(7L, -11L, 13L))))
  }

  test("detects a single changed document in a corpus checksum") {
    val docs = (1 to 100).map(i => s"doc body $i")
    def sum(ds: Seq[String]): Long = ds.toDS()
      .select(graft.functions.RollingHash.rolling_hash(col("value"))
        .bitwiseOR(1).as("u"))
      .agg(ModProduct.product_mod64(col("u"))).as[Long].collect()(0)
    val base = sum(docs)
    assert(sum(docs.reverse) === base)                 // order-free
    assert(sum(docs.updated(41, "doc body 42x")) !== base) // tamper-evident
    assert(sum(docs.drop(1)) !== base)                 // missing-doc-evident
  }
}
