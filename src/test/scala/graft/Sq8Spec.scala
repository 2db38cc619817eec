package graft

import graft.ext.{CodesIndex, Similarity}
import graft.queries.SimilarityQueries
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** SQ8 quantization quality: the asymmetric-dequantized ranking must
  * agree with exact cosine almost everywhere — 8 bits per dimension
  * against per-dim corpus range keeps relative component error ≤
  * 1/255, far under the fixture's neighbor separation. Round 12: the
  * codes are byte-PACKED into a persisted BinaryType artifact
  * (CodesIndex) — the pack/unpack identity, the packed-vs-inline
  * dequantization equality, and the 8× payload cut are pinned here. */
class Sq8Spec extends SparkTestBase {

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("probe_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("pack/unpack is the identity on valid codes; invalid codes fail loud") {
    import graft.functions.{PackBytesLong, UnpackBytesLong}
    val codes = spark.sql(
      "SELECT array(0L, 1L, 127L, 128L, 255L) AS c")
    val rt = codes.select(UnpackBytesLong.unpack_bytes(
        PackBytesLong.pack_bytes(col("c"))).as("r"))
      .head().getSeq[Long](0)
    assert(rt === Seq(0L, 1L, 127L, 128L, 255L),
      "bytes must round-trip UNSIGNED (128/255 would go negative signed)")
    // payload is exactly one byte per code
    assert(codes.select(length(PackBytesLong.pack_bytes(col("c"))))
      .head().getInt(0) === 5)
    // out-of-range codes must never truncate silently
    val bad = spark.sql("SELECT array(0L, 256L) AS c")
      .select(PackBytesLong.pack_bytes(col("c")))
    val e = intercept[Exception] { bad.collect() }
    assert(e.getMessage != null)
  }

  test("packed SQ8 artifact: 64 B/vector (8x cut vs snapped int64), stats ride the index") {
    val emb = Tables(spark, sf()).embeddings
    val path = java.nio.file.Files
      .createTempDirectory("graft-sq8-spec").toString + "/idx"
    graft.core.IndexStore.ensure(spark, path) { s =>
      CodesIndex.writeSq8(emb, s) }
    // every packed row is exactly dims bytes — the 8x cut vs 8 B/dim
    val lens = spark.read.parquet(path)
      .select(length(col("codes")).as("n")).distinct().collect()
    assert(lens.map(_.getInt(0)).toSeq === Seq(64))
    // stats come from the artifact, not a recompute, and have dims entries
    val st = CodesIndex.sq8Stats(spark, path)
    assert(st.mn.length === 64 && st.span.length === 64)
    assert(st.span.forall(_ >= 1L), "span is floored at 1 (div-safe)")
    // the packed read's dequantization == the inline formula over raw
    val inline = emb
      .select(col("vec_id"), Similarity.snapVec(col("embedding")).as("sv"))
      .select(col("vec_id"), lit(st.mn).as("__mn"), lit(st.span).as("__sp"),
        col("sv"))
      .selectExpr("vec_id",
        """transform(sv, (x, i) ->
          |  element_at(__mn, i + 1) +
          |  ((x - element_at(__mn, i + 1)) * CAST(255 AS BIGINT)
          |     div element_at(__sp, i + 1)) * element_at(__sp, i + 1)
          |     div CAST(255 AS BIGINT)) AS dv""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val packed = CodesIndex.sq8Dequantized(spark, path)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(packed === inline,
      "decode of the packed artifact must equal the inline dequantization")
  }

  test("packed PQ artifact: codes/codebook read back equal the inline encode") {
    val emb = Tables(spark, sf()).embeddings
    val path = java.nio.file.Files
      .createTempDirectory("graft-pq-spec").toString + "/idx"
    graft.core.IndexStore.ensure(spark, path) { s =>
      CodesIndex.writePq(emb, s, nSub = 4, k = 16) }
    val meta = CodesIndex.pqMeta(spark, path)
    assert(meta === CodesIndex.PqMeta(4, 16, 16))
    // nSub bytes per vector on the scan
    val lens = spark.read.parquet(path).filter(col("kind") === "v")
      .select(length(col("codes")).as("n")).distinct().collect()
    assert(lens.map(_.getInt(0)).toSeq === Seq(4))
    // unpacked codes == the inline encoder's codes, row for row
    val subs = SimilarityQueries.pqSubs(emb, 4, 16)
    val inline = SimilarityQueries
      .pqEncode(subs, SimilarityQueries.pqCodebook(subs, 16))
      .select("vec_id", "sub", "code").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val packed = CodesIndex.pqCodesOf(spark, path).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(packed === inline)
    // codebook rows committed with the codes
    assert(CodesIndex.pqCodebookOf(spark, path).count() === 4L * 16L)
  }

  test("SQ8 lifecycle: append uses STANDING stats; cadence rebuild equals a fresh write") {
    val emb = Tables(spark, sf()).embeddings
    val base = emb.filter(col("vec_id") % 5 =!= 0)
    val batch1 = emb.filter(col("vec_id") % 10 === 0)
    val batch2 = emb.filter(col("vec_id") % 10 === 5)
    val root = java.nio.file.Files
      .createTempDirectory("graft-sq8-life").toString
    val path = s"$root/idx"
    CodesIndex.writeSq8(base, path)
    val st0 = CodesIndex.sq8Stats(spark, path)
    assert(CodesIndex.sq8Pending(spark, path) === 0)
    // append encodes against the standing stats and does NOT refit them
    assert(!CodesIndex.appendAndMaybeRebuildSq8(batch1, path, emb,
      rebuildEvery = 2))
    assert(CodesIndex.sq8Pending(spark, path) === 1)
    val st1 = CodesIndex.sq8Stats(spark, path)
    assert(st1.mn.toSeq === st0.mn.toSeq && st1.span.toSeq === st0.span.toSeq)
    assert(spark.read.parquet(path).count() === base.count() + batch1.count())
    // second append crosses the cadence: rebuild over the full corpus
    assert(CodesIndex.appendAndMaybeRebuildSq8(batch2, path, emb,
      rebuildEvery = 2))
    assert(CodesIndex.sq8Pending(spark, path) === 0, "rebuild resets pending")
    // the rebuilt artifact equals a from-scratch write over the corpus
    val fresh = s"$root/fresh"
    CodesIndex.writeSq8(emb, fresh)
    def rows(p: String) = spark.read.parquet(p).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    assert(rows(path) === rows(fresh))
    val (stR, stF) = (CodesIndex.sq8Stats(spark, path),
      CodesIndex.sq8Stats(spark, fresh))
    assert(stR.mn.toSeq === stF.mn.toSeq && stR.span.toSeq === stF.span.toSeq)
  }

  test("PQ lifecycle: append encodes against the STANDING codebook; rebuild equals a fresh write") {
    val emb = Tables(spark, sf()).embeddings
    val base = emb.filter(col("vec_id") % 5 =!= 0)
    val batch1 = emb.filter(col("vec_id") % 10 === 0)
    val batch2 = emb.filter(col("vec_id") % 10 === 5)
    val root = java.nio.file.Files
      .createTempDirectory("graft-pq-life").toString
    val path = s"$root/idx"
    CodesIndex.writePq(base, path, nSub = 4, k = 16)
    val cb0 = CodesIndex.pqCodebookOf(spark, path).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getSeq[Long](2)).toMap
    assert(CodesIndex.pqPending(spark, path) === 0)
    // append: codes for the batch equal the inline encode against the
    // STANDING codebook (not a re-trained one)
    assert(!CodesIndex.appendAndMaybeRebuildPq(batch1, path, emb,
      rebuildEvery = 2))
    assert(CodesIndex.pqPending(spark, path) === 1)
    val cb1 = CodesIndex.pqCodebookOf(spark, path).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getSeq[Long](2)).toMap
    assert(cb1 === cb0, "append must not re-train the codebook")
    val batchIds = batch1.select("vec_id").collect().map(_.getLong(0)).toSet
    val appended = CodesIndex.pqCodesOf(spark, path)
      .filter(col("vec_id").isin(batchIds.toSeq: _*)).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val inline = SimilarityQueries.pqEncode(
        SimilarityQueries.pqSubs(batch1, 4, 16),
        CodesIndex.pqCodebookOf(spark, path)).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(appended === inline)
    // cadence rebuild re-trains from the source == a fresh write
    assert(CodesIndex.appendAndMaybeRebuildPq(batch2, path, emb,
      rebuildEvery = 2))
    assert(CodesIndex.pqPending(spark, path) === 0)
    val fresh = s"$root/fresh"
    CodesIndex.writePq(emb, fresh, nSub = 4, k = 16)
    def codes(p: String) = CodesIndex.pqCodesOf(spark, p).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(codes(path) === codes(fresh))
  }

  test("SQ8 append saturates out-of-range components instead of failing the ingest") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-sq8-sat").toString
    val path = s"$root/idx"
    val base = spark.sql(
      """SELECT * FROM VALUES
        |  (1L, array(CAST(0.1 AS FLOAT), CAST(0.2 AS FLOAT))),
        |  (2L, array(CAST(0.3 AS FLOAT), CAST(0.4 AS FLOAT)))
        |AS t(vec_id, embedding)""".stripMargin)
    CodesIndex.writeSq8(base, path)
    // one vector far outside the fitted range on both dims
    CodesIndex.appendSq8(spark.sql(
      """SELECT * FROM VALUES
        |  (3L, array(CAST(9.9 AS FLOAT), CAST(-9.9 AS FLOAT)))
        |AS t(vec_id, embedding)""".stripMargin), path)
    val dv = CodesIndex.sq8Dequantized(spark, path)
      .filter(col("vec_id") === 3L).head().getSeq[Long](1)
    // clamped to the standing range edges: dim0 -> mx (0.3 snapped),
    // dim1 -> mn (0.2 snapped) — bounded error until the cadence refit
    assert(dv === Seq(300000L, 200000L),
      s"out-of-range components must saturate at the range edge, got $dv")
  }

  test("clipped fit: outlier saturates at the quantile edge, mass keeps full resolution") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-sq8-clip").toString
    // 200 mass rows in [0, 0.2) plus one 100x outlier per dim
    val mass = (0 until 200).map(i =>
      s"(${i}L, array(CAST(0.001 * ${i % 200} AS FLOAT), CAST(0.001 * ${(i * 7) % 200} AS FLOAT)))")
    val emb = spark.sql(
      s"""SELECT * FROM VALUES ${mass.mkString(",")},
         |  (999L, array(CAST(20.0 AS FLOAT), CAST(20.0 AS FLOAT)))
         |AS t(vec_id, embedding)""".stripMargin)
    val (raw, clip) = (s"$root/raw", s"$root/clip")
    CodesIndex.writeSq8(emb, raw)
    CodesIndex.writeSq8Clipped(emb, clip, 0.01)
    // raw fit: the outlier stretches the span ~100x, so the mass's 200
    // distinct values collapse into few codes; clipped fit restores
    // near-1:1 resolution and the outlier SATURATES at the p99 edge
    def massLevels(p: String) = CodesIndex.sq8Dequantized(spark, p)
      .filter(col("vec_id") < 200)
      .select(expr("dv[0]")).distinct().count()
    val (rawLevels, clipLevels) = (massLevels(raw), massLevels(clip))
    assert(rawLevels < 10,
      s"raw min/max fit under a 100x outlier should collapse the mass, got $rawLevels levels")
    assert(clipLevels > 150,
      s"clipped fit must restore mass resolution, got $clipLevels levels")
    val st = CodesIndex.sq8Stats(spark, clip)
    val outlier = CodesIndex.sq8Dequantized(spark, clip)
      .filter(col("vec_id") === 999L).head().getSeq[Long](1)
    assert(outlier === Seq(st.mn(0) + st.span(0), st.mn(1) + st.span(1)),
      "the outlier must saturate at the clipped range edge")
  }

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
