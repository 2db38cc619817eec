package graft

import graft.ext.{Multimodal, TextAnalysis}
import graft.functions.RollingHash
import graft.functions.RollingHash.rolling_hash
import org.apache.spark.sql.functions._

class ExtensionsSpec extends SparkTestBase {
  import spark.implicits._

  test("rolling_hash expression matches the Scala reference (codegen path)") {
    val docs = Seq("hello world", "", "a", "the quick brown fox", "ünïcødé").toDF("text")
    val got = docs.select(col("text"), rolling_hash(col("text")).as("h"))
      .as[(String, Long)].collect().toMap
    got.foreach { case (s, h) => assert(h === RollingHash.reference(s), s"for '$s'") }
  }

  test("two rolling_hash calls share one codegen stage without colliding") {
    val df = Seq(("abc", "xyz"), ("q", "r")).toDF("a", "b")
    val got = df.select(rolling_hash(col("a")).as("ha"), rolling_hash(col("b")).as("hb"))
      .as[(Long, Long)].collect().toSeq
    assert(got === Seq(
      (RollingHash.reference("abc"), RollingHash.reference("xyz")),
      (RollingHash.reference("q"), RollingHash.reference("r"))))
  }

  test("rolling_hash survives a filter pushdown context (stays in plan)") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val n = docs.select(rolling_hash(col("text")).as("h")).filter(col("h") =!= 0).count()
    assert(n > 0)
  }

  test("punct_count matches the regex form it replaces (incl. unicode)") {
    val cases = Seq("hello, world!", "", "abc", "  \t\n", "a.b,c;d:e!f?",
      "ünïcödé ✓ test", "emoji 😀 x", "1+1=2", "no punct here 123")
    val got = cases.toDF("s")
      .select(col("s"), graft.functions.PunctCount.punct_count(col("s")))
      .as[(String, Long)].collect().toMap
    cases.foreach { s =>
      assert(got(s) === graft.functions.PunctCount.reference(s), s"for '$s'")
    }
    // differential vs the regex expression on real corpus text
    val docs = spark.read.parquet(sf() + "/documents.parquet").limit(200)
    val diff = docs.select(
        graft.functions.PunctCount.punct_count(col("text")).as("fast"),
        (length(col("text")) -
          length(regexp_replace(col("text"), "[^a-zA-Z0-9\\s]", ""))).as("slow"))
      .filter(col("fast") =!= col("slow")).count()
    assert(diff === 0)
  }

  test("punct_count and rolling_hash generated code compiles (no interpreted fallback)") {
    // A Janino parse failure in doGenCode silently demotes the expression to
    // interpreted mode — results stay identical, so a plain result-compare
    // test cannot catch it. Compile the emitted Java directly: a codegen
    // regression throws here instead of falling back.
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateMutableProjection
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    val in = BoundReference(0, StringType, nullable = true)
    val proj = GenerateMutableProjection.generate(
      Seq(graft.functions.PunctCount(in), graft.functions.RollingHash(in)))
    val row = proj(InternalRow(UTF8String.fromString("a, b! ünïcødé?")))
    assert(row.getLong(0) === graft.functions.PunctCount.reference("a, b! ünïcødé?"))
    assert(row.getLong(1) === RollingHash.reference("a, b! ünïcødé?"))
    // And end-to-end through whole-stage codegen with fallback disabled, so a
    // compile failure inside the fused stage fails the query instead of
    // re-running interpreted.
    spark.conf.set("spark.sql.codegen.fallback", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val got = Seq("x! y?", "").toDF("s")
        .select(graft.functions.PunctCount.punct_count(col("s")).as("p"),
          rolling_hash(col("s")).as("h"))
        .as[(Long, Long)].collect().toSeq
      assert(got === Seq(
        (graft.functions.PunctCount.reference("x! y?"), RollingHash.reference("x! y?")),
        (0L, RollingHash.reference(""))))
    } finally {
      spark.conf.unset("spark.sql.codegen.fallback")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("sorted_intersect_count matches size(array_intersect) on sorted distinct arrays") {
    val rnd = new scala.util.Random(42)
    val cases = (0 until 50).map { _ =>
      val pool = (0 until 30).map(i => s"tok$i")
      val a = rnd.shuffle(pool).take(rnd.nextInt(pool.size + 1)).distinct.sorted
      val b = rnd.shuffle(pool).take(rnd.nextInt(pool.size + 1)).distinct.sorted
      (a, b)
    } :+ ((Seq.empty[String], Seq("x"))) :+ ((Seq.empty[String], Seq.empty[String]))
    val df = cases.toDF("a", "b")
    val got = df.select(
      graft.functions.SortedIntersectCount.sorted_intersect_count(col("a"), col("b")).as("n"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("ref"))
      .as[(Long, Long)].collect()
    got.foreach { case (n, ref) => assert(n === ref) }
  }

  test("sorted_intersect_count skips null elements instead of NPEing (containsNull inputs)") {
    // the declared input type admits nulls even though the graft callers
    // never produce them — a null element must be ignored by the merge,
    // in both the interpreted and the codegen path
    val df = Seq(
      (Seq[String](null, "a", "b"), Seq("a", "b", "c")),
      (Seq("a", null.asInstanceOf[String], "c"), Seq[String](null, "c")),
      (Seq[String](null), Seq[String](null))
    ).toDF("a", "b")
    val got = df.select(graft.functions.SortedIntersectCount
      .sorted_intersect_count(col("a"), col("b")).as("n")).as[Long].collect()
    assert(got.toSeq === Seq(2L, 1L, 0L))
  }

  test("sorted_intersect_count on unsorted input undercounts deterministically, never throws") {
    // the documented contract for precondition-violating callers: an
    // UNDERCOUNT (merge skips past out-of-order elements), never an
    // exception and never an overcount — same behavior interpreted and
    // codegen'd. ("b","a","c") x ("a","b","c"): merge finds b then c.
    val df = Seq(
      (Seq("b", "a", "c"), Seq("a", "b", "c")),
      (Seq("c", "b", "a"), Seq("a", "b", "c")),
      (Seq("z", "a"), Seq("a", "z"))
    ).toDF("a", "b")
    val expr = graft.functions.SortedIntersectCount
      .sorted_intersect_count(col("a"), col("b")).as("n")
    val got = df.select(expr).as[Long].collect().toSeq
    assert(got === Seq(2L, 1L, 1L)) // each <= the true intersection size (3, 3, 2)
    val trueSizes = df.select(size(array_intersect(col("a"), col("b"))).cast("long"))
      .as[Long].collect().toSeq
    got.lazyZip(trueSizes).foreach { case (n, t) => assert(n <= t) }
  }

  test("sorted_intersect_count generated code compiles (no interpreted fallback)") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateMutableProjection
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    val at = ArrayType(StringType, containsNull = false)
    val proj = GenerateMutableProjection.generate(Seq(
      graft.functions.SortedIntersectCount(
        BoundReference(0, at, nullable = true), BoundReference(1, at, nullable = true))))
    def arr(xs: String*) = new GenericArrayData(xs.map(UTF8String.fromString).toArray[Any])
    val row = proj(InternalRow(arr("a", "b", "d"), arr("b", "c", "d", "e")))
    assert(row.getLong(0) === 2L)
  }

  test("multimodal decode over a TRUE parquet binary fixture (real BINARY IO, not a string cast)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-media").toString
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    Multimodal.mediaFixtureFrame(docs)
      .write.mode("overwrite").parquet(tmp + "/media.parquet")
    val media = spark.read.parquet(tmp + "/media.parquet")
    assert(media.schema("payload").dataType.typeName === "binary")
    val metas = Multimodal.decodeMeta(media).collect()
    assert(metas.length === docs.count())
    // the fixture's contract survives the parquet round-trip: PNG magic
    // header, variable body length 8 + 16 * (doc_id % 5 + 1)
    metas.foreach { m =>
      assert(m.header_hex === "89504E470D0A1A0A", s"doc ${m.doc_id} header")
      assert(m.byte_len === 8 + 16 * (m.doc_id % 5 + 1), s"doc ${m.doc_id} len")
    }
    // the registered query prefers the media table when the dir has one
    docs.write.mode("overwrite").parquet(tmp + "/documents.parquet")
    val viaQuery = graft.queries.AnalysisQueries.multimodalMeta(spark, tmp)
      .select(col("doc_id"), col("byte_len"), col("header_hex"))
      .as[(Long, Long, String)].collect()
    viaQuery.foreach { case (id, len, hdr) =>
      assert(hdr === "89504E470D0A1A0A" && len === 8 + 16 * (id % 5 + 1))
    }
    assert(viaQuery.length === metas.length)
  }

  test("multimodal decode produces deterministic metadata from payload bytes") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val metas = Multimodal.decodeMeta(docs).collect()
    assert(metas.length === docs.count())
    val texts = docs.select("doc_id", "text").as[(Long, String)].collect().toMap
    metas.take(20).foreach { m =>
      val bytes = texts(m.doc_id).getBytes("UTF-8")
      assert(m.byte_len === bytes.length)
      assert(m.width === (bytes.length % 640))
      assert(m.header_hex === bytes.take(8).map(b => f"${b & 0xff}%02X").mkString)
    }
  }

  test("media frame sampling tiles the payload and bridges to per-frame hashing") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    // step=1: every frame — the slices must TILE the payload exactly
    val all = Multimodal.sampleFrames(docs, step = 1)
      .groupBy(col("doc_id")).agg(sum(col("frame_len")).as("total"),
        count(lit(1)).as("nf"))
      .as[(Long, Long, Long)].collect()
      .map { case (id, total, nf) => id -> ((total, nf)) }.toMap
    val texts = docs.select("doc_id", "text").as[(Long, String)].collect().toMap
    for ((id, (total, nf)) <- all) {
      val n = texts(id).getBytes("UTF-8").length
      assert(total === n.toLong, s"doc $id: frame slices must tile all $n bytes")
      assert(nf === (n % 30 + 1).toLong)
    }
    // step=3 is the registered subset of step=1's frames, hashes agree
    val sampled = Multimodal.sampleFrames(docs, step = 3)
      .as[(Long, Int, Long, String)].collect()
    assert(sampled.forall(_._2 % 3 == 0))
    val one = sampled.find(_._3 > 0).get
    val bytes = texts(one._1).getBytes("UTF-8")
    val frames = bytes.length % 30 + 1
    val start = bytes.length.toLong * one._2 / frames
    val end = bytes.length.toLong * (one._2 + 1) / frames
    val md = java.security.MessageDigest.getInstance("MD5")
    val expect = md.digest(java.util.Arrays.copyOfRange(
      bytes, start.toInt, end.toInt)).map(b => f"${b & 0xff}%02x").mkString
    assert(one._4 === expect, "frame hash must equal the recomputed slice hash")
  }

  test("resize plan fits the box, keeps aspect, never upscales") {
    val meta = Multimodal.decodeMeta(
      spark.read.parquet(sf() + "/documents.parquet")).toDF()
    val plans = Multimodal.resizePlan(meta, box = 64)
      .as[(Long, Int, Int, Int, Int)].collect()
    for ((_, w, h, ow, oh) <- plans) {
      assert(ow <= 64 && oh <= 64)
      assert(ow <= w.max(1) && oh <= h.max(1), "no upscaling")
      // integer fixed-point aspect: out dims derive from ONE shared scale
      val s = ((64 * 256L) / w.max(1)).min((64 * 256L) / h.max(1)).min(256L)
      assert(ow === (w * s / 256).toInt && oh === (h * s / 256).toInt)
    }
  }

  test("media features bridge into the ANN index unchanged") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val emb = Multimodal.features(docs)
      .select(col("doc_id").as("vec_id"),
        col("features").cast("array<float>").as("embedding"))
    val path = java.nio.file.Files.createTempDirectory("graft-media-ann")
      .toString + "/ivf"
    graft.core.IndexStore.ensure(spark, path) { scratch =>
      graft.ext.AnnIndex.write(emb, scratch, k = 4)
    }
    val idx = graft.ext.AnnIndex.read(spark, path)
    // every doc's content vector landed in a cell of the committed index
    assert(idx.filter(col("kind") === "v").count() === docs.count())
    assert(graft.ext.AnnIndex.centroids(idx).count() > 0)
  }

  test("fingerprint is order- and repetition-insensitive") {
    val df = Seq("b a b c", "c b a", "a b c c c").toDF("text")
    val fps = df.select(TextAnalysis.fingerprint(split(col("text"), " ")))
      .as[String].collect()
    assert(fps.distinct.length === 1)
  }

  test("first_event_after matches the HOF chain it replaces, on real events") {
    import graft.functions.FirstEventAfter.first_event_after
    val evs = graft.sources.Tables(spark, sf()).events
      .groupBy(col("user_id"))
      .agg(collect_list(struct(col("ts_us").as("ts"),
        col("event_type").as("t"))).as("__evs"))
    def hof(ev: String, after: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      array_min(transform(
        filter(col("__evs"), e => e("t") === ev && e("ts") > after),
        e => e("ts")))
    // chain both derivations independently and compare every stage
    val diff = evs
      .withColumn("f1", first_event_after(col("__evs"), lit("view"), lit(Long.MinValue)))
      .withColumn("f2", first_event_after(col("__evs"), lit("click"), col("f1")))
      .withColumn("f3", first_event_after(col("__evs"), lit("purchase"), col("f2")))
      .withColumn("h1", hof("view", lit(Long.MinValue)))
      .withColumn("h2", hof("click", col("h1")))
      .withColumn("h3", hof("purchase", col("h2")))
      .filter(!(col("f1") <=> col("h1")) || !(col("f2") <=> col("h2")) ||
        !(col("f3") <=> col("h3")))
      .count()
    assert(diff === 0)
  }

  test("first_event_after null chain: unreached prior stage nulls the next") {
    import graft.functions.FirstEventAfter.first_event_after
    val df = Seq(
      (1L, Seq((10L, "view"), (20L, "click"))),  // reaches 2
      (2L, Seq((10L, "click"))),                 // no view -> s1 null -> s2 null
      (3L, Seq((10L, "view"), (10L, "click")))   // same ts: strict > blocks s2
    ).toDF("id", "raw")
      .withColumn("__evs", transform(col("raw"),
        r => struct(r("_1").as("ts"), r("_2").as("t"))))
      .withColumn("s1", first_event_after(col("__evs"), lit("view"), lit(Long.MinValue)))
      .withColumn("s2", first_event_after(col("__evs"), lit("click"), col("s1")))
      .select(col("id"), col("s1"), col("s2"))
      .as[(Long, Option[Long], Option[Long])].collect().sortBy(_._1)
    assert(df.toSeq === Seq(
      (1L, Some(10L), Some(20L)),
      (2L, None, None),
      (3L, Some(10L), None)))
  }

  test("l2_long matches aggregate(zip_with) on real snapped embeddings") {
    import graft.functions.L2DistanceLong.l2_long
    val emb = spark.read.parquet(sf() + "/embeddings.parquet").limit(200)
      .select(col("vec_id"), graft.ext.Similarity.snapVec(col("embedding")).as("sv"))
    val pairs = emb.as("a").join(emb.as("b"),
      col("a.vec_id") < col("b.vec_id") && col("b.vec_id") < 20)
    val diff = pairs.select(
        l2_long(col("a.sv"), col("b.sv")).as("fast"),
        aggregate(zip_with(col("a.sv"), col("b.sv"), (x, y) => (x - y) * (x - y)),
          lit(0L), (acc, x) => acc + x).as("slow"))
      .filter(col("fast") =!= col("slow")).count()
    assert(diff === 0)
  }

  test("snap_vec matches the transform HOF on real embeddings, both element types") {
    import graft.functions.SnapVecLong.snap_vec
    def snapHof(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      transform(c, x =>
        floor(x.cast("double") * lit(1000000.0) + lit(0.5)).cast("long"))
    val emb = spark.read.parquet(sf() + "/embeddings.parquet")
    val diff = emb.select(
        snap_vec(col("embedding")).as("fast"),
        snapHof(col("embedding")).as("slow"))
      .filter(col("fast") =!= col("slow")).count()
    assert(diff === 0)
    // double-array input path
    val d = Seq(Seq(0.1d, -0.5d, 2.9999995d)).toDF("v")
    val got = d.select(snap_vec(col("v"))).as[Seq[Long]].collect().head
    assert(got === Seq(100000L, -500000L, 3000000L))
  }

  test("l2_long generated code compiles (no interpreted fallback)") {
    import graft.functions.L2DistanceLong.l2_long
    spark.conf.set("spark.sql.codegen.fallback", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val got = Seq((Seq(1L, 2L, 3L), Seq(4L, 0L, 3L))).toDF("a", "b")
        .select(l2_long(col("a"), col("b"))).as[Long].collect().head
      assert(got === 13L) // 9 + 4 + 0
      // snap_vec through the same CODEGEN_ONLY gate (array output path)
      val sn = Seq(Seq(1.5f, -2.25f)).toDF("v")
        .select(graft.functions.SnapVecLong.snap_vec(col("v")))
        .as[Seq[Long]].collect().head
      assert(sn === Seq(1500000L, -2250000L))
    } finally {
      spark.conf.unset("spark.sql.codegen.fallback")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("first_event_after generated code compiles (no interpreted fallback)") {
    import graft.functions.FirstEventAfter.first_event_after
    spark.conf.set("spark.sql.codegen.fallback", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val got = Seq(Seq((5L, "view"), (9L, "click")))
        .toDF("raw")
        .withColumn("__evs", transform(col("raw"),
          r => struct(r("_1").as("ts"), r("_2").as("t"))))
        .select(
          first_event_after(col("__evs"), lit("view"), lit(Long.MinValue)).as("s1"),
          first_event_after(col("__evs"), lit("missing"), lit(Long.MinValue)).as("none"))
        .as[(Option[Long], Option[Long])].collect().head
      assert(got === ((Some(5L), None)))
    } finally {
      spark.conf.unset("spark.sql.codegen.fallback")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }
}
