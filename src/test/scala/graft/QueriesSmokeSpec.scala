package graft

import org.apache.spark.sql.SparkSession

/** Driver-shaped smoke: every registered query runs at sf0.001 and
  * returns a well-formed result; entry() returns rows; every oracle key
  * refers to a registered query. Mirrors the driver's t1 gate. */
class QueriesSmokeSpec extends SparkTestBase {

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("every query runs at sf0.001 and most return rows") {
    val empty = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val n = fn(spark, sf()).count()
      if (n == 0) empty += name
    }
    // d3/y2/y3 may legitimately be empty at the tiny sf; q7's one
    // nation pair × two shipment years has zero matching lineitems in
    // sf0.001's 6k rows (DuckDB-confirmed on the raw parquet — data,
    // not plan). q11's NATION_7 slice of 6k lineitems has no part above
    // 2× the slice mean at this sf (127 rows, hash-green at sf0.01) —
    // also a data property. Nothing else may be empty.
    val allowedEmpty = Set("d3_neardup_pairs", "y2_embed_neardup", "y3_ann_lsh",
      "q7_nation_volume", "q11_important_stock")
    assert((empty.toSet -- allowedEmpty).isEmpty,
      s"unexpectedly empty: ${empty.toSet -- allowedEmpty}")
  }

  test("graft SQL functions work through the SQL surface") {
    // (a second builder().getOrCreate() in the same JVM would reuse the
    // shared session and silently skip extensions — register on the live
    // registry with the same builders GraftExtensions injects)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hash", exprs => graft.functions.RollingHash(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_long", exprs => graft.functions.DotProductLong(exprs(0), exprs(1)), "scala_udf")
    val r = spark.sql("SELECT rolling_hash('hello world') AS h, " +
      "dot_long(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d").collect()(0)
    assert(r.getLong(0) === graft.functions.RollingHash.reference("hello world"))
    assert(r.getLong(1) === 32L)
    assert(new GraftExtensions() != null) // constructible for spark.sql.extensions
  }
}
