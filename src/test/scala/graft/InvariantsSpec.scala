package graft

import graft.ext.{Dedup, Similarity}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Cross-cutting invariants of the dedup/similarity primitives, plus a
  * schema guard over the driver-generated testdata (catches drift in
  * later rounds before it breaks oracles). */
class InvariantsSpec extends SparkTestBase {
  import spark.implicits._

  test("identical texts produce identical minhash signatures and survive the full pipeline at jaccard 1.0") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"), // exact dup
      (3L, "totally different words here nothing shared at all ok")
    ).toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(docs)
    val rows = sigs.collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(rows(1L) === rows(2L))
    assert(rows(1L) !== rows(3L))
    val verified = Dedup.verifyJaccard(docs, Dedup.candidatePairs(sigs), 0.8).collect()
    assert(verified.length === 1)
    assert(verified.head.getAs[Long]("a_id") === 1L)
    assert(verified.head.getAs[Double]("jaccard") === 1.0)
  }

  test("cosine(v, v) ~ 1 and symmetric under the snapped arithmetic") {
    val vecs = Tables(spark, sf()).embeddings.limit(20)
      .select(col("vec_id"), Similarity.snapVec(col("embedding")).as("sv"))
      .withColumn("nrm", Similarity.normSnapped(col("sv")))
    val self = vecs.select(Similarity.cosineFromSnapped(
      col("sv"), col("sv"), col("nrm"), col("nrm")).as("c")).as[Double].collect()
    self.foreach(c => assert(math.abs(c - 1.0) < 1e-12))
    val a = vecs.select(col("vec_id").as("ai"), col("sv").as("sa"), col("nrm").as("na"))
    val b = vecs.select(col("vec_id").as("bi"), col("sv").as("sb"), col("nrm").as("nb"))
    val pairs = a.join(b, col("ai") < col("bi"))
      .select(
        Similarity.cosineFromSnapped(col("sa"), col("sb"), col("na"), col("nb")).as("ab"),
        Similarity.cosineFromSnapped(col("sb"), col("sa"), col("nb"), col("na")).as("ba"))
      .as[(Double, Double)].collect()
    pairs.foreach { case (ab, ba) => assert(ab === ba) } // bitwise symmetric
  }

  test("identical vectors land in the same LSH bucket") {
    val v = Tables(spark, sf()).embeddings.limit(5)
      .select(Similarity.snapVec(col("embedding")).as("sv"))
    val b1 = v.select(Similarity.lshBucket(col("sv"), 8, 64).as("b")).as[Long].collect()
    val b2 = v.select(Similarity.lshBucket(col("sv"), 8, 64).as("b")).as[Long].collect()
    assert(b1.toSeq === b2.toSeq)
  }

  test("annIvf at lloydIters = 2 runs the identical round again and keeps the invariants") {
    // "further iterations are more of the identical rounds": iters = 2
    // must produce a well-formed top-3 per probe with exact-deterministic
    // scores, same schema and probe set as the default iters = 1
    val one = graft.queries.SimilarityQueries.annIvf(spark, sf(), lloydIters = 1)
    val two = graft.queries.SimilarityQueries.annIvf(spark, sf(), lloydIters = 2)
    assert(one.schema === two.schema)
    val rows = two.select(col("probe_id"), col("rank"), col("cos"))
      .as[(Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    // rank is 1..<=3 per probe, cosine non-increasing within a probe
    rows.groupBy(_._1).foreach { case (p, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === (1L to sorted.length).toSeq, s"probe $p ranks")
      assert(sorted.map(_._3).toSeq === sorted.map(_._3).sortBy(-_).toSeq, s"probe $p order")
    }
    assert(one.select("probe_id").distinct().count() ===
      two.select("probe_id").distinct().count())
    // determinism: the same call twice is bitwise-identical
    val again = graft.queries.SimilarityQueries.annIvf(spark, sf(), lloydIters = 2)
      .select(col("probe_id"), col("rank"), col("cos"))
      .as[(Long, Long, Double)].collect()
    assert(rows.sortBy(r => (r._1, r._2)).toSeq === again.sortBy(r => (r._1, r._2)).toSeq)
  }

  test("approx_count_distinct within 5% of exact (rsd=0.02 plus small-N variance)") {
    val rows = graft.queries.EventQueries.approxDistinct(spark, sf())
      .select(col("event_type"), col("exact_users"), col("approx_within_5pct"))
      .as[(String, Long, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (et, exact, ok) =>
      assert(ok, s"$et: approx estimate outside 5% of exact $exact")
    }
  }

  test("xxh64 hash mode: exact dups still collide, and the verified pair set matches md5 mode") {
    // the production minhash family (no DuckDB counterpart, so no
    // oracle): same topology, so the exact-Jaccard-verified OUTPUT
    // depends on the hash only through LSH recall — identical on this
    // corpus (4-band / 2-row structure at these doc sizes); an
    // adversarial corpus could differ in candidates, never in precision
    val docs = Tables(spark, sf()).documents
    def pairs(mode: String) = {
      val sh = Dedup.shingleFrame(docs)
      Dedup.verifyJaccardOnShingles(sh,
          Dedup.candidatePairs(Dedup.signaturesFromShingles(sh, hashMode = mode)), 0.8)
        .select(col("a_id"), col("b_id")).as[(Long, Long)].collect().toSet
    }
    val md5Pairs = pairs("md5")
    val xxhPairs = pairs("xxh64")
    assert(md5Pairs.nonEmpty)
    assert(xxhPairs === md5Pairs)
    // sig columns are BIGINT in xxh64 mode, and identical texts collide
    val dup = Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(dup, hashMode = "xxh64").collect()
    assert(sigs.head.schema("sig0").dataType.typeName === "long")
    assert(sigs(0).toSeq.drop(1) === sigs(1).toSeq.drop(1))
    intercept[IllegalArgumentException](Dedup.signaturesFromShingles(
      Dedup.shingleFrame(dup), hashMode = "sha1"))
  }

  test("xxh64 simhash mode: banding is brute-force-complete within the mode, exact dups pair in both modes") {
    // Unlike the minhash modes (where the exact-Jaccard verify makes the
    // OUTPUT hash-independent), a simhash IS its hash: on this heavily
    // templated corpus most doc pairs sit at the Hamming-radius margin,
    // so the <=2 pair SET genuinely differs between hash families
    // (measured at sf0.001: 2291 md5 pairs vs 3588 xxh64, overlap 1023 —
    // margin membership is hash noise, not signal). The mode-invariant
    // contracts, asserted exactly:
    //  1. within either mode, band rotation finds EXACTLY the brute-force
    //     Hamming<=2 pairs (pigeonhole completeness is hash-independent);
    //  2. identical distinct-token sets hash to the identical simhash in
    //     both modes, so exact-dup pairs (Hamming 0) appear in both.
    val docs = Tables(spark, sf()).documents
    def toks = docs.select(col("doc_id"),
      explode(array_distinct(split(col("text"), "\\s+"))).as("t"))
    def pairsOf(mode: String): Set[(Long, Long)] = {
      val s = Dedup.simhash(toks, hashMode = mode).persist()
      try {
        val banded = Dedup.simhashBandPairs(s, maxHamming = 2)
          .select(col("a_id"), col("b_id")).as[(Long, Long)].collect().toSet
        val a = s.select(col("doc_id").as("a_id"), col("simhash").as("ha"))
        val b = s.select(col("doc_id").as("b_id"), col("simhash").as("hb"))
        val brute = a.join(b, col("a_id") < col("b_id"))
          .filter(bit_count(col("ha").bitwiseXOR(col("hb"))) <= 2)
          .select(col("a_id"), col("b_id")).as[(Long, Long)].collect().toSet
        assert(banded === brute, s"banding incomplete in $mode mode")
        banded
      } finally { s.unpersist(); () }
    }
    val md5Pairs = pairsOf("md5")
    val xxhPairs = pairsOf("xxh64")
    assert(md5Pairs.nonEmpty && xxhPairs.nonEmpty)
    // pairs with IDENTICAL distinct-token sets have identical simhashes
    // under any hash family (Hamming 0) — present in both modes' output
    val ts = docs.select(col("doc_id"),
      sort_array(array_distinct(split(col("text"), "\\s+"))).as("ts"))
    val tokExact = ts.select(col("doc_id").as("a_id"), col("ts").as("ta"))
      .join(ts.select(col("doc_id").as("b_id"), col("ts").as("tb")),
        col("a_id") < col("b_id") && col("ta") === col("tb"))
      .select(col("a_id"), col("b_id")).as[(Long, Long)].collect().toSet
    assert(tokExact.subsetOf(md5Pairs) && tokExact.subsetOf(xxhPairs))
    // identical token sets -> identical simhashes, in the new mode too
    val twin = Seq((1L, "alpha"), (1L, "beta"), (2L, "alpha"), (2L, "beta"))
      .toDF("doc_id", "t")
    val sims = Dedup.simhash(twin, hashMode = "xxh64")
      .as[(Long, Long)].collect().toMap
    assert(sims(1L) === sims(2L))
    intercept[IllegalArgumentException](Dedup.simhash(twin, hashMode = "sha1"))
  }

  test("shingle-less docs never pair, in either hash mode, and degenerate pairs don't divide by zero") {
    // docs under 3 tokens have empty shingle arrays -> null sigs; both
    // hash modes must emit NULL bands for them (xxhash64 would otherwise
    // hash all-null sigs to the bare seed and collide every short doc
    // into one O(m^2) bucket)
    val shorts = Seq((1L, "hi"), (2L, "yo"), (3L, "ok there"),
      (4L, "a proper document with plenty of words inside it"))
      .toDF("doc_id", "text")
    for (mode <- Seq("md5", "xxh64")) {
      val cand = Dedup.candidatePairs(
        Dedup.signaturesFromShingles(Dedup.shingleFrame(shorts), hashMode = mode))
      assert(cand.count() === 0L, s"mode $mode paired shingle-less docs")
    }
    // a forced degenerate pair scores jaccard 0.0 instead of throwing
    // DIVIDE_BY_ZERO under ANSI
    val pair = Seq((1L, 2L)).toDF("a_id", "b_id")
    val v = Dedup.verifyJaccardOnShingles(Dedup.shingleFrame(shorts), pair, 0.8)
    assert(v.count() === 0L) // 0.0 < 0.8: filtered, not thrown
  }

  test("dedupApply keeps exactly one doc per cluster and accounts for every corpus doc") {
    val survivors = graft.queries.DedupQueries.dedupApply(spark, sf())
      .select(col("doc_id"), col("n_merged")).as[(Long, Long)].collect().toMap
    val clusters = graft.queries.DedupQueries.dupClusters(spark, sf())
      .select(col("doc_id"), col("cluster_id")).as[(Long, Long)].collect()
    val nDocs = Tables(spark, sf()).documents.count()
    // every cluster contributes exactly its min member, with the cluster size
    clusters.groupBy(_._2).foreach { case (cid, members) =>
      assert(survivors.contains(cid), s"cluster $cid canonical missing")
      assert(survivors(cid) === members.length.toLong, s"cluster $cid size")
      members.map(_._1).filter(_ != cid).foreach(m =>
        assert(!survivors.contains(m), s"non-canonical $m survived"))
    }
    // survivors + dropped docs partition the corpus: each survivor
    // represents n_merged docs, nothing is double-counted or lost
    assert(survivors.values.sum === nDocs)
  }

  test("incremental near-dup matches the d3-route pairs and never re-tokenizes the corpus") {
    val docs = Tables(spark, sf()).documents
    val batchPred = col("doc_id") % 5 === 0
    val idx = java.nio.file.Files.createTempDirectory("graft-d9-spec").toString
    Dedup.writeNeardupIndex(docs.filter(!batchPred), idx)
    val inc = Dedup.incrementalNeardup(spark, docs.filter(batchPred), idx, 0.8)
    val got = inc.select(col("batch_id"), col("corpus_id"))
      .as[(Long, Long)].collect().toSet

    // reference: the established d3 pipeline over the WHOLE corpus,
    // restricted to pairs spanning the batch/corpus split — band
    // collisions and Jaccard are per-pair properties, so the incremental
    // path must find exactly these
    val sh = Dedup.shingleFrame(docs)
    val cand = Dedup.candidatePairs(Dedup.signaturesFromShingles(sh))
    val expected = Dedup.verifyJaccardOnShingles(sh, cand, 0.8)
      .select(col("a_id"), col("b_id")).as[(Long, Long)].collect()
      .flatMap { case (a, b) =>
        if (a % 5 == 0 && b % 5 != 0) Some((a, b))
        else if (b % 5 == 0 && a % 5 != 0) Some((b, a))
        else None
      }.toSet
    assert(got === expected)
    assert(got.nonEmpty)

    // scale contract: the returned plan reads the batch from the cached
    // shingle frame and the corpus ONLY from the index parquet — no
    // direct documents.parquet relation may appear (re-tokenizing the
    // corpus is exactly what the index exists to avoid)
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val rels = inc.queryExecution.optimizedPlan.collect {
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        fs.location.rootPaths.mkString(",")
    }
    assert(rels.count(_.contains("graft-d9-spec")) === 2,
      s"expected 2 pruned index scans (bands + shingles), got $rels")
    assert(!rels.exists(_.contains("documents.parquet")),
      s"corpus re-scan found in $rels")
  }

  test("cluster-frame reuse: dedupApplyOn/curatePack overloads equal the registered queries") {
    // a library pipeline computes connected components ONCE and feeds
    // the (doc_id, cluster_id) frame to every consumer — the overloads
    // must be pointwise identical to the self-contained gate queries
    val docs = Tables(spark, sf()).documents
    val clusters = graft.queries.DedupQueries.dupClusters(spark, sf())
    val viaOverload = graft.queries.DedupQueries.dedupApplyOn(docs, clusters)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    val registered = graft.queries.DedupQueries.dedupApply(spark, sf())
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(viaOverload === registered)
    val packOverload = graft.queries.AnalysisQueries
      .curatePack(spark, sf(), clusters)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val packRegistered = graft.queries.AnalysisQueries.curatePack(spark, sf())
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(packOverload === packRegistered)
    assert(packOverload.nonEmpty)
    graft.core.CacheScope.releaseAll()
  }

  test("packSequences: per-shard token offsets are a prefix sum and seq ids are the offset div budget") {
    val rows = graft.queries.AnalysisQueries
      .packSequences(spark, sf(), nShards = 4, budget = 64L)
      .select(col("doc_id"), col("shard"), col("n_tok"), col("seq_id"))
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, shard, _, _) => assert(shard === id % 4) }
    rows.groupBy(_._2).foreach { case (_, docs) =>
      var offset = 0L
      docs.sortBy(_._1).foreach { case (id, _, nTok, seqId) =>
        assert(seqId === offset / 64L, s"doc $id seq id")
        offset += nTok
      }
    }
    // packing is deterministic: a second run assigns identically
    val again = graft.queries.AnalysisQueries
      .packSequences(spark, sf(), nShards = 4, budget = 64L)
      .select(col("doc_id"), col("shard"), col("n_tok"), col("seq_id"))
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
  }

  test("lsh plane count: buckets nest, occupancy refines, pair sets shrink monotonically") {
    // the scale knob the y3/y6 overloads surface: raising nPlanes must
    // strictly refine the bucket partition (lshBucket's prefix
    // property), so occupancy and candidate counts can only shrink
    val sv = Tables(spark, sf()).embeddings
      .select(col("vec_id"), Similarity.snapVec(col("embedding")).as("sv"))
    val buckets = sv.select(col("vec_id"),
        Similarity.lshBucket(col("sv"), 4, 64).as("b4"),
        Similarity.lshBucket(col("sv"), 8, 64).as("b8"),
        Similarity.lshBucket(col("sv"), 10, 64).as("b10"))
      .as[(Long, Long, Long, Long)].collect()
    assert(buckets.nonEmpty)
    // nesting: lower-plane bucket = higher-plane bucket mod 2^planes
    buckets.foreach { case (id, b4, b8, b10) =>
      assert(b4 === (b8 & 15L), s"vec $id: b4 not a prefix of b8")
      assert(b8 === (b10 & 255L), s"vec $id: b8 not a prefix of b10")
    }
    // refinement: max occupancy is non-increasing in plane count, and
    // the candidate-pair universe (same-bucket pairs) only shrinks
    def maxOcc(f: ((Long, Long, Long, Long)) => Long) =
      buckets.groupBy(f).values.map(_.length).max
    assert(maxOcc(_._4) <= maxOcc(_._3) && maxOcc(_._3) <= maxOcc(_._2))
    // y3 output at 8 planes is a subset of the 6-plane output (same
    // exact-cosine verify, strictly coarser candidate generation at 6)
    def y3Pairs(n: Int) = graft.queries.SimilarityQueries.annLsh(spark, sf(), n)
      .select(col("a_id"), col("b_id")).as[(Long, Long)].collect().toSet
    val p8 = y3Pairs(8)
    val p6 = y3Pairs(6)
    assert(p8.subsetOf(p6))
    assert(p6.nonEmpty)
    // OR-ing a second independent band only ADDS recall: the multiband
    // pair set contains the single-band one (band 0 IS y3's bucket),
    // and band 0's bucket equals lshBucket exactly
    val mb = graft.queries.SimilarityQueries.annLshMultiband(spark, sf())
      .select(col("a_id"), col("b_id")).as[(Long, Long)].collect().toSet
    assert(p8.subsetOf(mb))
    val snapped = Tables(spark, sf()).embeddings
      .select(Similarity.snapVec(col("embedding")).as("sv"))
    val sameBucket = snapped.select(
        Similarity.lshBucket(col("sv"), 8, 64).as("b"),
        Similarity.lshBucketBand(col("sv"), 0, 8, 64).as("b0"))
      .filter(col("b") =!= col("b0")).count()
    assert(sameBucket === 0L)
    graft.core.CacheScope.releaseAll()
  }

  test("incremental ANN equals the direct bucket-join reference and never re-snaps the corpus") {
    val inc = graft.queries.SimilarityQueries.incrementalAnn(spark, sf())
    val got = inc.select(col("probe_id"), col("neighbor_id"), col("rank"))
      .as[(Long, Long, Long)].collect().toSet
    // reference: the same semantics computed directly over embeddings
    val emb = Tables(spark, sf()).embeddings
    val sv = emb.select(col("vec_id"), Similarity.snapVec(col("embedding")).as("sv"))
      .withColumn("nrm", Similarity.normSnapped(col("sv")))
      .withColumn("bucket", Similarity.lshBucket(col("sv"), 8, 64))
    val probes = sv.filter(col("vec_id") % 5 === 0)
      .select(col("vec_id").as("p"), col("sv").as("pv"),
        col("nrm").as("pn"), col("bucket"))
    val corpus = sv.filter(col("vec_id") % 5 =!= 0)
      .select(col("vec_id").as("n"), col("sv").as("nv"),
        col("nrm").as("nn"), col("bucket").as("bucket_b"))
    val all = probes.join(corpus, col("bucket") === col("bucket_b"))
      .select(col("p"), col("n"), Similarity.cosineFromSnapped(
        col("pv"), col("nv"), col("pn"), col("nn")).as("cos"))
      .as[(Long, Long, Double)].collect()
    val expected = all.groupBy(_._1).toSeq.flatMap { case (_, cands) =>
      cands.sortBy(c => (-c._3, c._2)).take(3).zipWithIndex
        .map { case ((p, n, _), i) => (p, n, (i + 1).toLong) }
    }.toSet
    assert(got === expected)
    assert(got.nonEmpty)
    // scale contract: the corpus side comes from the index parquet
    // (pre-snapped), embeddings.parquet is scanned once for the probes
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val rels = inc.queryExecution.optimizedPlan.collect {
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        fs.location.rootPaths.mkString(",")
    }
    assert(rels.count(_.contains("graft-ann-index")) === 1, s"index scan missing: $rels")
    assert(rels.count(_.contains("embeddings.parquet")) === 1,
      s"corpus re-projection found: $rels")
  }

  test("knnGraph returns each vector's true bucket-restricted top-k") {
    val knn = graft.queries.SimilarityQueries.knnGraph(spark, sf())
      .select(col("a_id"), col("b_id"), col("cos"))
      .as[(Long, Long, Double)].collect()
    assert(knn.nonEmpty)
    // brute-force reference: same buckets, same cosine, rank by
    // (cos desc, b_id asc), take 5
    val emb = Tables(spark, sf()).embeddings
    val sv = emb.select(col("vec_id"), Similarity.snapVec(col("embedding")).as("sv"))
      .withColumn("nrm", Similarity.normSnapped(col("sv")))
      .withColumn("bucket", Similarity.lshBucket(col("sv"), 8, 64))
    val a = sv.select(col("vec_id").as("a_id"), col("sv").as("av"),
      col("nrm").as("an"), col("bucket"))
    val b = sv.select(col("vec_id").as("b_id"), col("sv").as("bv"),
      col("nrm").as("bn"), col("bucket").as("bucket_b"))
    val all = a.join(b, col("bucket") === col("bucket_b") && col("a_id") =!= col("b_id"))
      .select(col("a_id"), col("b_id"), Similarity.cosineFromSnapped(
        col("av"), col("bv"), col("an"), col("bn")).as("cos"))
      .as[(Long, Long, Double)].collect()
    val expected = all.groupBy(_._1).toSeq.flatMap { case (_, cands) =>
      cands.sortBy(c => (-c._3, c._2)).take(5).toSeq
    }.toSet
    assert(knn.toSet === expected)
  }

  test("balancedSample membership matches the exact driver-side reference (weights + md5 buckets)") {
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
    val docs = Tables(spark, sf()).documents
      .select(col("doc_id"), col("source"),
        size(split(col("text"), "\\s+")).cast("long").as("n_tok"))
      .as[(Long, String, Long)].collect()
    val perSource = docs.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val total = perSource.values.sum
    val nSources = perSource.size
    val rate = perSource.map { case (s, n) =>
      s -> math.min(1.0, 0.5 * (total.toDouble / (nSources.toDouble * n.toDouble)))
    }
    val expected = docs.collect {
      case (id, src, _) if java.lang.Long.parseLong(
          md5hex(id.toString).take(8), 16) % 1000000 <
          rate(src) * 1000000.0 => id
    }.toSet
    val got = graft.queries.AnalysisQueries.balancedSample(spark, sf())
      .select(col("doc_id")).as[Long].collect().toSet
    assert(got === expected)
    assert(got.nonEmpty && got.size < docs.length)
  }

  test("packShuffled: seeded order is deterministic and seq ids follow the per-shard prefix sum") {
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
    val rows = graft.queries.AnalysisQueries
      .packShuffled(spark, sf(), nShards = 4, budget = 64L)
      .select(col("doc_id"), col("shard"), col("n_tok"), col("seq_id"))
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._2).foreach { case (_, docs) =>
      var offset = 0L
      docs.sortBy(d => (md5hex(s"seed42_${d._1}"), d._1)).foreach {
        case (id, _, nTok, seqId) =>
          assert(seqId === offset / 64L, s"doc $id seq id under shuffled order")
          offset += nTok
      }
    }
    val again = graft.queries.AnalysisQueries
      .packShuffled(spark, sf(), nShards = 4, budget = 64L)
      .select(col("doc_id"), col("shard"), col("n_tok"), col("seq_id"))
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
  }

  test("sourceOverlap is symmetric-upper-triangular and bounded by the smaller side's shingle count") {
    val m = graft.queries.AnalysisQueries.sourceOverlap(spark, sf())
      .select(col("source_a"), col("source_b"), col("n_shared_shingles"))
      .as[(String, String, Long)].collect()
    assert(m.nonEmpty)
    m.foreach { case (a, b, n) =>
      assert(a < b, "matrix must be upper-triangular (each pair once)")
      assert(n > 0)
    }
    // shared count can never exceed either side's distinct-shingle total
    val perSource = graft.ext.Dedup.shingleFrame(Tables(spark, sf()).documents)
      .join(Tables(spark, sf()).documents.select(col("doc_id"), col("source")), "doc_id")
      .select(explode(col("sh")).as("shingle"), col("source"))
      .distinct().groupBy(col("source")).count()
      .as[(String, Long)].collect().toMap
    m.foreach { case (a, b, n) =>
      assert(n <= math.min(perSource(a), perSource(b)))
    }
  }

  test("chunkDocs windows reconstruct every doc's token sequence at the documented overlap") {
    val docs = Tables(spark, sf()).documents
    val chunks = graft.queries.AnalysisQueries.chunkDocs(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getString(3)))
      .groupBy(_._1).map { case (id, cs) => id -> cs.sortBy(_._2) }
    val toks = docs.select(col("doc_id"), split(col("text"), "\\s+").as("t"))
      .as[(Long, Seq[String])].collect().toMap
    assert(chunks.keySet === toks.keySet, "every doc must emit chunks")
    for ((id, cs) <- chunks) {
      val t = toks(id)
      // ceil(n/stride) chunks, ids dense from 0
      assert(cs.map(_._2) === (0L until ((t.length + 47) / 48).toLong))
      for ((_, cid, n, text) <- cs) {
        val expect = t.slice((cid * 48).toInt, (cid * 48).toInt + 64)
        assert(n === expect.length.toLong)
        assert(text === expect.mkString(" "),
          s"doc $id chunk $cid must be tokens [${cid * 48}, ${cid * 48 + 64})")
      }
      // stride < window: consecutive chunks overlap, so concatenating
      // each chunk's first `stride` tokens (all of the last chunk)
      // reproduces the doc exactly
      val rebuilt = cs.init.flatMap(_._4.split(" ", -1).take(48)) ++
        cs.last._4.split(" ", -1)
      assert(rebuilt.toSeq === t, s"doc $id must reassemble from its chunks")
    }
  }

  test("lmScore: scores lie in (0, 1], cover exactly the docs with a bigram, repetitive text scores higher than gibberish") {
    val scored = graft.queries.AnalysisQueries.lmScore(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val withBigrams = Tables(spark, sf()).documents
      .filter(size(split(col("text"), "\\s+")) >= 2)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(scored.map(_._1).toSet === withBigrams)
    scored.foreach { case (id, n, s) =>
      assert(n >= 1L)
      assert(s > 0.0 && s <= 1.0, s"doc $id score $s out of range")
    }
    // the model is the corpus's own: a doc that repeats one corpus
    // bigram must outscore a doc of singleton (count-1) bigrams
    val docs = Seq(
      (1L, ("the cat " * 30).trim),
      (2L, (1 to 60).map(i => s"zz$i").mkString(" "))
    ).toDF("doc_id", "text").withColumn("lang", lit("en"))
      .withColumn("source", lit("t")).withColumn("n_chars", length(col("text")))
    val tmp = java.nio.file.Files.createTempDirectory("graft-lm").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val m = graft.queries.AnalysisQueries.lmScore(spark, tmp)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(m(1L) > m(2L),
      "repeated corpus bigrams must outscore one-off gibberish bigrams")
  }

  test("semanticDedup: survivors have no within-cell pair at tau, every dropped vec has a lower-id witness") {
    val tau = 0.4
    val survivors = graft.queries.SimilarityQueries.semanticDedup(spark, sf(), tau)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val all = Tables(spark, sf()).embeddings
      .select(col("vec_id"), Similarity.snapVec(col("embedding")).as("sv"))
      .withColumn("nrm", Similarity.normSnapped(col("sv")))
      .collect().map(r => (r.getLong(0),
        r.getSeq[Long](1).toArray, r.getDouble(2)))
    def cos(a: (Long, Array[Long], Double), b: (Long, Array[Long], Double)) =
      a._2.zip(b._2).map { case (x, y) => x * y }.sum.toDouble / (a._3 * b._3)
    val byId = all.map(v => v._1 -> v).toMap
    val cells = survivors.groupBy(_._2)
    assert(survivors.nonEmpty && survivors.length < all.length,
      "dedup must keep some and drop some on this corpus")
    for ((_, members) <- cells; Array(x, y) <- members.map(m => byId(m._1))
        .sortBy(_._1).combinations(2))
      assert(cos(x, y) < tau,
        s"survivors ${x._1},${y._1} violate the within-cell separation")
    val survivorIds = survivors.map(_._1).toSet
    // recompute each dropped vec's cell via the library's own assignment
    // is overkill here: the witness property only needs SOME lower-id
    // vec within tau anywhere in the corpus (cells only shrink the
    // candidate set), which is what greedy semantic dedup guarantees
    for (v <- all if !survivorIds.contains(v._1))
      assert(all.exists(a => a._1 < v._1 && cos(a, v) >= tau),
        s"dropped vec ${v._1} has no lower-id near neighbor")
  }

  test("pqCodes: 4 codes per vector, argmin verified brute-force, codebook seeds encode to themselves at qdist 0") {
    val codes = graft.queries.SimilarityQueries.pqCodes(spark, sf())
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    val sv = Tables(spark, sf()).embeddings
      .select(col("vec_id"), Similarity.snapVec(col("embedding")).as("sv"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(codes.size === sv.size * 4)
    val cb = (0L until 16L).map(c => c -> sv(c)).toMap
    for (((vid, sub), (code, qdist)) <- codes) {
      assert(code >= 0L && code < 16L)
      val ssv = sv(vid).slice((sub * 16).toInt, (sub * 16).toInt + 16)
      val dists = cb.map { case (c, v) =>
        val cs = v.slice((sub * 16).toInt, (sub * 16).toInt + 16)
        c -> ssv.zip(cs).map { case (x, y) => (x - y) * (x - y) }.sum
      }
      val best = dists.minBy { case (c, d) => (d, c) }
      assert((best._2, best._1) === (qdist, code),
        s"vec $vid sub $sub: expected code ${best._1} at ${best._2}")
      if (vid < 16L) assert(code === vid && qdist === 0L,
        "codebook seeds must quantize to themselves exactly")
    }
  }

  test("pqAdc equals the brute-force asymmetric-distance ranking over the codes") {
    val got = graft.queries.SimilarityQueries.pqAdc(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    graft.core.CacheScope.releaseAll()
    val sv = Tables(spark, sf()).embeddings
      .select(col("vec_id"), Similarity.snapVec(col("embedding")).as("sv"))
      .as[(Long, Seq[Long])].collect().toMap
    val codes = graft.queries.SimilarityQueries.pqCodes(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    def subv(v: Seq[Long], s: Long) = v.slice((s * 16).toInt, (s * 16).toInt + 16)
    def l2(a: Seq[Long], b: Seq[Long]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val probes = sv.keys.filter(_ < 16).toSeq.sorted
    val corpus = sv.keys.filter(_ >= 16).toSeq.sorted
    val expect = probes.flatMap { p =>
      corpus.map { v =>
        val adc = (0L until 4L).map(s =>
          l2(subv(sv(p), s), subv(sv(codes((v, s))), s))).sum
        (p, v, adc)
      }.sortBy(t => (t._3, t._2)).take(3).zipWithIndex
        .map { case ((pp, vv, a), i) => (pp, vv, (i + 1).toLong, a) }
    }
    assert(got.sortBy(t => (t._1, t._3)).toSeq === expect,
      "ADC top-3 must match the exact table-lookup recomputation")
  }

  test("ivfPqAdc equals the driver-side IVF-PQ recomputation (cells, codes, cell-restricted ADC)") {
    val got = graft.queries.SimilarityQueries.ivfPqAdc(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    graft.core.CacheScope.releaseAll()
    val sv = Tables(spark, sf()).embeddings
      .select(col("vec_id"), Similarity.snapVec(col("embedding")).as("sv"))
      .as[(Long, Seq[Long])].collect().toMap
    // coarse quantizer, replicated exactly: seed = the 16 vectors with
    // the lowest (md5(vec_id), vec_id) given dense ids in hash order
    // (the seedCentroids rule), L2 argmin with (dist, id) tie-break,
    // one Lloyd round of floored int means, re-assign
    def l2(a: Seq[Long], b: Seq[Long]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def assign(cents: Map[Long, Seq[Long]]): Map[Long, Long] =
      sv.map { case (id, v) =>
        id -> cents.map { case (c, cv) => (l2(v, cv), c) }.min._2
      }
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
    val seed = sv.keys.toSeq.map(id => (md5hex(id.toString), id)).sorted
      .take(16).zipWithIndex
      .map { case ((_, id), c) => c.toLong -> sv(id) }.toMap
    val a0 = assign(seed)
    val refined = a0.groupBy(_._2).map { case (c, ms) =>
      val vs = ms.keys.toSeq.map(sv)
      c -> vs.head.indices.map { d =>
        val s = vs.map(_(d)).sum
        math.floor(s.toDouble / vs.length.toDouble).toLong
      }
    }
    val cells = assign(refined)
    // fine quantizer from the library's own y9 (already brute-verified)
    val codes = graft.queries.SimilarityQueries.pqCodes(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    def subv(v: Seq[Long], s: Long) = v.slice((s * 16).toInt, (s * 16).toInt + 16)
    val probes = sv.keys.filter(_ < 16).toSeq.sorted
    val corpus = sv.keys.filter(_ >= 16).toSeq.sorted
    val expect = probes.flatMap { p =>
      corpus.filter(v => cells(v) == cells(p)).map { v =>
        val adc = (0L until 4L).map(s =>
          l2(subv(sv(p), s), subv(sv(codes((v, s))), s))).sum
        (v, adc)
      }.sortBy { case (v, adc) => (adc, v) }.take(3).zipWithIndex
        .map { case ((v, adc), i) =>
          (p, v, cells(p), (i + 1).toLong, adc) }
    }.toSet
    assert(got.toSet === expect,
      "IVF-PQ must be exactly y10's ADC ranking restricted to the probe's cell")
    assert(got.nonEmpty)
  }

  test("ivfPq nprobe dial: probing 2 cells dominates 1 cell order-statistic-wise and spans <=2 cells") {
    def run(np: Int) = {
      val r = graft.queries.SimilarityQueries.ivfPqAdc(spark, sf(), nProbeCells = np)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
      graft.core.CacheScope.releaseAll(); r
    }
    val np1 = run(1)
    val np2 = run(2)
    assert(np1.nonEmpty && np2.nonEmpty)
    val by1 = np1.groupBy(_._1); val by2 = np2.groupBy(_._1)
    // candidates only grow: every probe answered at np1 is answered at np2
    assert(by1.keySet.subsetOf(by2.keySet))
    for ((p, rows1) <- by1) {
      val a1 = rows1.sortBy(_._4).map(_._5) // adc by rank
      val a2 = by2(p).sortBy(_._4).map(_._5)
      // superset of candidates ⇒ each order statistic can only improve
      for (i <- a1.indices if i < a2.length)
        assert(a2(i) <= a1(i), s"probe $p rank ${i + 1} regressed")
      assert(a2.length >= a1.length, s"probe $p lost answers")
      // np1 searches exactly one cell; np2 at most two
      assert(rows1.map(_._3).distinct.length === 1)
      assert(by2(p).map(_._3).distinct.length <= 2)
    }
  }

  test("bloom screen flags a superset of the exact decontamination, per doc and in count") {
    val exact = graft.queries.AnalysisQueries.decontaminate(spark, sf())
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.core.CacheScope.releaseAll()
    val bloom = graft.queries.AnalysisQueries.bloomDecontaminate(spark, sf())
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.core.CacheScope.releaseAll()
    assert(exact.nonEmpty, "exact decontamination must be non-vacuous here")
    for ((doc, n) <- exact) {
      assert(bloom.contains(doc), s"bloom missed contaminated doc $doc")
      assert(bloom(doc) >= n,
        s"doc $doc: bloom flagged ${bloom(doc)} < exact $n — false NEGATIVE")
    }
    // the xxh64 production mode keeps the same no-false-negative
    // contract (different hash family, so flag counts may differ)
    val xx = graft.queries.AnalysisQueries
      .bloomDecontaminate(spark, sf(), "xxh64")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.core.CacheScope.releaseAll()
    for ((doc, n) <- exact) {
      assert(xx.contains(doc) && xx(doc) >= n,
        s"doc $doc: xxh64 bloom false negative")
    }
  }

  test("corpusReport cells are internally consistent with marginals and the grand total") {
    val rows = graft.queries.AnalysisQueries.corpusReport(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.getString(2)), Option(r.getString(3)), r.getLong(4), r.getLong(5)))
    val cells = rows.filter(r => r._1 == 0 && r._2 == 0)
    val byLang = rows.filter(r => r._1 == 0 && r._2 == 1)
    val total = rows.filter(r => r._1 == 1 && r._2 == 1)
    assert(total.length === 1)
    assert(total.head._5 === cells.map(_._5).sum)
    assert(total.head._6 === cells.map(_._6).sum)
    for (l <- byLang) {
      val mine = cells.filter(_._3 == l._3)
      assert(l._5 === mine.map(_._5).sum, s"lang ${l._3} doc marginal")
      assert(l._6 === mine.map(_._6).sum, s"lang ${l._3} token marginal")
    }
    assert(total.head._5 === Tables(spark, sf()).documents.count())
  }

  test("clusterBest picks the max-quality member (min id on ties) and counts every member") {
    val docs = Tables(spark, sf()).documents
    val clusters = graft.queries.DedupQueries.dupClusters(spark, sf())
    val got = graft.queries.DedupQueries.clusterBestOn(docs, clusters)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toMap
    // reference: member quality via the SAME library scoring (textStats'
    // formula), argmax resolved driver-side with the documented
    // (quality desc, doc_id asc) order
    val qual = docs
      .select(col("doc_id"), col("text"), split(col("text"), "\\s+").as("__toks"))
      .select(col("doc_id"),
        size(col("__toks")).cast("long").as("n"),
        graft.ext.TextAnalysis.stopwordRatio(col("__toks")).as("sr"),
        graft.ext.TextAnalysis.punctRatio(col("text")).as("pr"))
      .select(col("doc_id"),
        ((least(col("n").cast("double"), lit(100.0)) / lit(100.0)) *
          (lit(1.0) - col("sr")) * (lit(1.0) - col("pr"))).as("q"))
      .as[(Long, Double)].collect().toMap
    val members = clusters.select(col("doc_id"), col("cluster_id"))
      .as[(Long, Long)].collect().groupBy(_._2)
    assert(got.keySet === members.keySet)
    for ((cid, ms) <- members) {
      val ids = ms.map(_._1)
      val best = ids.map(id => (id, qual(id))).minBy { case (id, q) => (-q, id) }
      assert(got(cid) === ((best._1, best._2, ids.length.toLong)), s"cluster $cid")
      assert(ids.contains(got(cid)._1), s"cluster $cid best not a member")
    }
    // the registered self-contained query agrees with the overload
    val registered = graft.queries.DedupQueries.clusterBest(spark, sf())
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toMap
    assert(registered === got)
    graft.core.CacheScope.releaseAll()
  }

  test("dedupApplyBest keeps exactly d10's representative per cluster and accounts for every doc") {
    val docs = Tables(spark, sf()).documents
    val clusters = graft.queries.DedupQueries.dupClusters(spark, sf())
    val best = graft.queries.DedupQueries.clusterBestOn(docs, clusters)
      .select(col("cluster_id"), col("best_id"), col("n_members"))
      .as[(Long, Long, Long)].collect()
    val surv = graft.queries.DedupQueries.dedupApplyBestOn(docs, clusters)
      .as[(Long, Long)].collect().toMap
    val memberIds = clusters.select(col("doc_id")).as[Long].collect().toSet
    // each cluster's ONLY survivor is its d10 best, with the cluster size
    for ((cid, bid, n) <- best) {
      assert(surv.get(bid) === Some(n), s"cluster $cid best $bid")
    }
    val bestIds = best.map(_._2).toSet
    for (m <- memberIds if !bestIds.contains(m))
      assert(!surv.contains(m), s"non-best member $m survived")
    // unclustered docs pass through at n_merged = 1; totals partition
    val nDocs = docs.count()
    assert(surv.values.sum === nDocs)
    assert(surv.count(_._2 == 1L) === (nDocs - memberIds.size) +
      best.count(_._3 == 1L))
    // same survivor COUNT as d8 (one per cluster either way), and the
    // registered query matches the overload
    val d8 = graft.queries.DedupQueries.dedupApply(spark, sf())
    assert(d8.count() === surv.size.toLong)
    val registered = graft.queries.DedupQueries.dedupApplyBest(spark, sf())
      .as[(Long, Long)].collect().toMap
    assert(registered === surv)
    graft.core.CacheScope.releaseAll()
  }

  test("containment dominates jaccard on every candidate pair and d11 is its >=0.9 slice") {
    val docs = Tables(spark, sf()).documents
    val sh = Dedup.shingleFrame(docs).persist()
    try {
      val cand = Dedup.candidatePairs(Dedup.signaturesFromShingles(sh))
      val c = Dedup.verifyContainmentOnShingles(sh, cand, 0.0)
        .select(col("a_id"), col("b_id"), col("containment"), col("n_common"),
          col("n_a"), col("n_b"))
        .as[(Long, Long, Double, Long, Long, Long)].collect()
      val j = Dedup.verifyJaccardOnShingles(sh, cand, 0.0)
        .select(col("a_id"), col("b_id"), col("jaccard"))
        .as[(Long, Long, Double)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      assert(c.nonEmpty)
      c.foreach { case (a, b, cont, nc, na, nb) =>
        assert(cont >= 0.0 && cont <= 1.0, s"($a,$b) containment $cont")
        assert(cont >= j((a, b)), s"($a,$b): containment $cont < jaccard")
        if (math.min(na, nb) > 0)
          assert(cont === nc.toDouble / math.min(na, nb).toDouble)
      }
      val d11 = graft.queries.DedupQueries.containmentPairs(spark, sf())
        .select(col("a_id"), col("b_id")).as[(Long, Long)].collect().toSet
      assert(d11 === c.filter(_._3 >= 0.9).map(r => (r._1, r._2)).toSet)
    } finally { sh.unpersist(); graft.core.CacheScope.releaseAll() }
  }

  test("containmentJoin has COMPLETE recall: equals brute-force all-pairs, contains d11's LSH-bounded output") {
    val docs = Tables(spark, sf()).documents
    val sh = Dedup.shingleFrame(docs).persist()
    try {
      // brute force: every a<b pair, exact containment, no filter trick
      val a = sh.select(col("doc_id").as("a_id"), col("sh").as("sha"))
      val b = sh.select(col("doc_id").as("b_id"), col("sh").as("shb"))
      val brute = a.join(b, col("a_id") < col("b_id"))
        .withColumn("nc", graft.functions.SortedIntersectCount
          .sorted_intersect_count(col("sha"), col("shb")))
        .withColumn("mn", least(size(col("sha")), size(col("shb"))).cast("long"))
        .filter(col("mn") > 0 &&
          col("nc").cast("double") / col("mn").cast("double") >= 0.9)
        .select(col("a_id"), col("b_id")).as[(Long, Long)].collect().toSet
      val got = graft.queries.DedupQueries.containmentJoin(spark, sf())
        .select(col("a_id"), col("b_id")).as[(Long, Long)].collect().toSet
      assert(got === brute, "prefix filtering must lose NO qualifying pair")
      assert(got.nonEmpty)
      // the LSH-candidate variant can only ever find a subset
      val d11 = graft.queries.DedupQueries.containmentPairs(spark, sf())
        .select(col("a_id"), col("b_id")).as[(Long, Long)].collect().toSet
      assert(d11.subsetOf(got))
    } finally { sh.unpersist(); graft.core.CacheScope.releaseAll() }
  }

  test("qualityClassifier: raw matches a driver-side md5 recompute, score is a monotone squash into (0,1)") {
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
    val got = graft.queries.AnalysisQueries.qualityClassifier(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val texts = Tables(spark, sf()).documents
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toMap
    assert(got.length === texts.size)
    got.foreach { case (id, n, raw, score) =>
      // -1 keeps trailing empty tokens, matching Spark SQL's split
      val toks = texts(id).split("\\s+", -1).toSeq
      assert(n === toks.length.toLong)
      val expectRaw = toks.map(t =>
        java.lang.Long.parseLong(md5hex(t).take(4), 16) - 32768L).sum
      assert(raw === expectRaw, s"doc $id raw")
      val m = raw.toDouble / (n.toDouble * 32768.0)
      assert(score === 0.5 + 0.5 * m / (1.0 + math.abs(m)), s"doc $id score")
      assert(score > 0.0 && score < 1.0)
    }
    // monotone: a higher mean weight can only raise the score
    val sorted = got.sortBy(r => r._3.toDouble / r._2)
    sorted.sliding(2).foreach {
      case Array(lo, hi) => assert(lo._4 <= hi._4)
      case _ => ()
    }
    // xxh64 production mode: same plan contract — per-doc coverage,
    // (0,1) range, identical texts score identically, run-to-run
    // deterministic (weights differ from md5 mode by design)
    val xx = graft.queries.AnalysisQueries
      .qualityClassifier(spark, sf(), "xxh64")
      .collect().map(r => (r.getLong(0), r.getDouble(3)))
    assert(xx.length === texts.size)
    xx.foreach { case (id, s) => assert(s > 0.0 && s < 1.0, s"doc $id") }
    val xxById = xx.toMap
    for ((a, ta) <- texts; (b, tb) <- texts if a < b && ta == tb)
      assert(xxById(a) === xxById(b), s"identical docs $a,$b diverge")
    val again = graft.queries.AnalysisQueries
      .qualityClassifier(spark, sf(), "xxh64")
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toMap
    assert(xxById === again)
    intercept[IllegalArgumentException](
      graft.queries.AnalysisQueries.qualityClassifier(spark, sf(), "sha1"))
  }

  test("testdata schemas match FIXTURES.md (drift guard)") {
    val t = Tables(spark, sf())
    def names(df: org.apache.spark.sql.DataFrame) = df.schema.fieldNames.toSeq
    assert(names(t.lineitem) === Seq("l_orderkey", "l_partkey", "l_suppkey",
      "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate"))
    assert(names(t.orders) === Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority"))
    assert(names(t.events) === Seq("event_id", "user_id", "event_type",
      "value", "props", "ts_us")) // ts normalized to ts_us by the loader
    assert(names(t.documents) === Seq("doc_id", "text", "lang", "source", "n_chars"))
    assert(names(t.embeddings) === Seq("vec_id", "embedding", "label"))
    assert(t.events.schema("ts_us").dataType.typeName === "long")
  }
}
