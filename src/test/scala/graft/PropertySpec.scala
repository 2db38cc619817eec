package graft

import graft.ops.TextOps
import graft.streaming._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import scala.util.Random

/** SURVEY.md §5 property tests: tokenizer emptiness invariant and a
  * randomized differential test of the fraud fold against an
  * independently-written in-memory reference. */
class PropertySpec extends SparkTestBase {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("property: pack/unpack round-trips arbitrary code arrays; decode equals the HOF formula") {
    import graft.functions.{PackBytesLong, Sq8DecodeLong, UnpackBytesLong}
    val rnd = new Random(7)
    val cases = (1 to 30).map { _ =>
      val n = 1 + rnd.nextInt(80)
      (Seq.fill(n)(rnd.nextInt(256).toLong),          // codes 0..255
       Seq.fill(n)(rnd.nextLong() % 2000000L),        // mn, any sign
       Seq.fill(n)(1L + rnd.nextInt(2000000)))        // span >= 1
    }
    val df = cases.toDF("c", "mn", "sp")
    // round-trip identity on every random array, in one plan
    val rt = df.select(col("c"),
        UnpackBytesLong.unpack_bytes(PackBytesLong.pack_bytes(col("c")))
          .as("r"))
      .collect()
    assert(rt.forall(r => r.getSeq[Long](0) == r.getSeq[Long](1)))
    // the fused native decode == the dequantization HOF, component-wise
    val both = df.select(
        Sq8DecodeLong.sq8_decode(PackBytesLong.pack_bytes(col("c")),
          col("mn"), col("sp")).as("fused"),
        expr("""transform(c, (x, i) ->
               |  element_at(mn, i + 1) +
               |  x * element_at(sp, i + 1) div CAST(255 AS BIGINT))"""
          .stripMargin).as("hof"))
      .collect()
    assert(both.forall(r => r.getSeq[Long](0) == r.getSeq[Long](1)),
      "Sq8DecodeLong must equal the transform formula on random inputs")
    // out-of-range codes always refuse, never truncate
    val bad = Seq(Seq(256L), Seq(-1L)).toDF("c")
      .select(PackBytesLong.pack_bytes(col("c")))
    intercept[Exception] { bad.collect() }
  }

  test("property: tokenizer never yields empty tokens") {
    val rnd = new Random(42)
    val chars = "ab  c\t d\n e!#  "
    val lines = (1 to 200).map { _ =>
      (1 to rnd.nextInt(30)).map(_ => chars(rnd.nextInt(chars.length))).mkString
    }
    val toks = TextOps.explodeTokens(lines.toDF("value"), col("value"), "word")
      .as[String].collect()
    assert(toks.forall(_.nonEmpty))
    assert(toks.forall(t => !t.exists(_.isWhitespace)))
  }

  test("property: band rotation finds exactly the brute-force Hamming pairs") {
    // pigeonhole guarantee of Dedup.simhashBandPairs: with maxHamming+1
    // bands, the equi-join candidates cover every pair at Hamming <=
    // maxHamming, and the verify filter drops everything else — so the
    // result must EQUAL the all-pairs scan on random fingerprints
    val rnd = new Random(11)
    val bits = graft.ext.Dedup.simhashBits
    // cluster around a few centers so near pairs actually exist
    val centers = Seq.fill(6)(math.abs(rnd.nextLong()) & ((1L << bits) - 1))
    val sims = (0 until 300).map { i =>
      val c = centers(rnd.nextInt(centers.length))
      val flips = rnd.nextInt(4) // 0..3 bit flips
      val h = (0 until flips).foldLeft(c)((acc, _) => acc ^ (1L << rnd.nextInt(bits)))
      (i.toLong, h)
    }.toDF("doc_id", "simhash")
    val banded = graft.ext.Dedup.simhashBandPairs(sims, maxHamming = 2)
      .select("a_id", "b_id", "hamming")
      .as[(Long, Long, Long)].collect().toSet
    val rows = sims.as[(Long, Long)].collect()
    val brute = (for {
      (a, ha) <- rows; (b, hb) <- rows if a < b
      h = java.lang.Long.bitCount(ha ^ hb) if h <= 2
    } yield (a, b, h.toLong)).toSet
    assert(banded === brute)
    assert(brute.nonEmpty) // the generator must actually produce near pairs
  }

  test("connected components: golden clusters, and chains converge across rounds") {
    import graft.ext.Dedup
    // two triangles-ish clusters + a 10-node chain (diameter 9 forces
    // multiple propagation rounds) + an isolated pair
    val chain = (100L until 109L).map(i => (i, i + 1))
    val edges = (Seq((1L, 2L), (2L, 3L), (1L, 3L), (20L, 21L), (50L, 51L),
      (51L, 52L), (21L, 22L)) ++ chain).toDF("a_id", "b_id")
    val got = Dedup.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    val expect =
      Seq(1L -> 1L, 2L -> 1L, 3L -> 1L,
        20L -> 20L, 21L -> 20L, 22L -> 20L,
        50L -> 50L, 51L -> 50L, 52L -> 50L).toMap ++
        (100L to 109L).map(_ -> 100L).toMap
    assert(got === expect)
  }

  test("CacheScope.releaseAll frees the RDD storage behind CC results") {
    import graft.ext.Dedup
    graft.core.CacheScope.releaseAll() // clean slate from earlier tests
    // baseline: other suites in this JVM may hold persists (e.g.
    // localCheckpoints) this test doesn't own — diff against them
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a_id", "b_id")
    val viaHashMin = Dedup.connectedComponents(edges)
    val viaStar = Dedup.connectedComponentsStar(edges)
    // results stay readable while their backing RDDs are cached
    assert(viaHashMin.count() === 5 && viaStar.count() === 5)
    assert(spark.sparkContext.getPersistentRDDs.keySet.diff(before).nonEmpty,
      "CC results should be backed by persisted RDDs before release")
    graft.core.CacheScope.releaseAll()
    assert(spark.sparkContext.getPersistentRDDs.keySet.diff(before).isEmpty,
      "releaseAll must free the RDD persists catalog.clearCache cannot see")
    // releasing is safe, never wrong: the frames recompute from lineage
    assert(viaHashMin.count() === 5 && viaStar.count() === 5)
  }

  test("connected components: non-convergence throws instead of returning wrong labels") {
    import graft.ext.Dedup
    val chain = (0L until 9L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val e = intercept[IllegalStateException] {
      Dedup.connectedComponents(chain, maxIters = 3).collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("property: star contraction labels a diameter-120 path in O(log^2 n) rounds") {
    import graft.ext.Dedup
    // hash-to-min would need 120 rounds here; the star variant must land
    // the same labels well inside maxIters = 15 (~2 log2 rounds)
    val path = (0L until 120L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val got = Dedup.connectedComponentsStar(path, maxIters = 15)
      .as[(Long, Long)].collect().toMap
    assert(got === (0L to 120L).map(_ -> 0L).toMap)
  }

  test("property: star contraction matches hash-to-min on random graphs") {
    import graft.ext.Dedup
    for (seed <- Seq(1, 2, 3)) {
      val rnd = new Random(seed)
      // sparse random graph: many small components, some self-pairs
      val edges = ((0 until 150).map { _ =>
        (rnd.nextInt(120).toLong, rnd.nextInt(120).toLong)
      } :+ ((500L, 500L))).toDF("a_id", "b_id")
      val viaStar = Dedup.connectedComponentsStar(edges)
        .as[(Long, Long)].collect().toMap
      val viaHashMin = Dedup.connectedComponents(edges)
        .as[(Long, Long)].collect().toMap
      assert(viaStar === viaHashMin, s"seed=$seed")
    }
  }

  test("differential: fraud fold matches an independent reference on random input") {
    // independent reference implementation of FraudDetectorExample.java
    def referenceAlerts(txns: Seq[Transaction]): Seq[(String, Long, Int)] = {
      val byUser = txns.groupBy(_.userId)
      byUser.toSeq.flatMap { case (u, ts) =>
        var recent = List.empty[Transaction]
        var lastAlert = Option.empty[Long]
        ts.sortBy(_.timestamp).flatMap { tx =>
          if (tx.amount > 100) recent = recent :+ tx
          recent = recent.filter(_.timestamp >= tx.timestamp - 600000L)
          val throttled = lastAlert.exists(la => tx.timestamp - la <= 600000L)
          if (recent.size >= 3 && !throttled) {
            lastAlert = Some(tx.timestamp)
            Some((u, tx.timestamp, recent.size))
          } else None
        }
      }
    }

    val rnd = new Random(7)
    // distinct timestamps so ordering is unambiguous (Flink's arrival
    // order == timestamp order in this scenario)
    val txns = rnd.shuffle((1 to 300).toList).map { i =>
      Transaction(s"u${rnd.nextInt(5)}", rnd.nextInt(200).toDouble, i * 40000L)
    }
    val expected = referenceAlerts(txns)
      .map(a => (a._1, a._2, a._3)).sortBy(a => (a._1, a._2))

    val in = MemoryStream[Transaction]
    val q = StatefulOps.fraudAlerts(in.toDS())
      .writeStream.format("memory").queryName("prop_fraud").outputMode("append").start()
    // arrival order must respect time across micro-batches (a later batch
    // cannot deliver an earlier arrival); disorder *within* a batch is
    // what the fold's sortBy absorbs
    txns.sortBy(_.timestamp).grouped(37).foreach { batch =>
      in.addData(rnd.shuffle(batch)); q.processAllAvailable()
    }
    q.stop()
    val got = spark.table("prop_fraud").as[FraudAlert].collect()
      .map(a => (a.userId, a.timestamp, a.recentCount)).sortBy(a => (a._1, a._2)).toSeq
    assert(got === expected)
  }

  test("property: quality profile equals hand counts on random frames and random check sets") {
    // guards the ok-vector plumbing (posexplode + element_at 1-based
    // indexing): any off-by-one between a check's position and its
    // (kind, column, threshold) metadata mislabels EVERY report row.
    import graft.ext.Quality
    val rnd = new Random(7)
    for (round <- 1 to 5) {
      val n = 20 + rnd.nextInt(200)
      val rows = (1 to n).map { i =>
        (i.toLong,
         if (rnd.nextInt(10) == 0) null
         else rnd.alphanumeric.take(1 + rnd.nextInt(12)).mkString,
         rnd.nextInt(100).toLong)
      }
      val df = rows.toDF("id", "s", "v")
      // a shuffled check set with duplicate kinds on different dials,
      // so positional mixups cannot cancel out
      val checks = rnd.shuffle(Seq(
        Quality.complete("s", 800 + rnd.nextInt(200)),
        Quality.unique("s"),
        Quality.bounds("v", 10, 20 + rnd.nextInt(60), rnd.nextInt(1000)),
        Quality.bounds("v", 0, rnd.nextInt(100), rnd.nextInt(1000)),
        Quality.minLength("s", 1 + rnd.nextInt(10), rnd.nextInt(1000))))
      val got = Quality.profile(df, checks).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)) ->
          (r.getLong(3), r.getLong(4), r.getBoolean(5))).toSeq
      // hand recomputation, straight off the rows
      def okOf(c: Quality.DqCheck): Long = c.kind match {
        case "complete"   => rows.count(_._2 != null).toLong
        case "unique"     => rows.flatMap(r => Option(r._2)).distinct.size.toLong
        case "bounds"     =>
          val (lo, hi) = (c.sql.split("BETWEEN ")(1).split(" AND ").map(_.trim))
            match { case Array(a, b) => (a.toLong, b.takeWhile(_.isDigit).toLong) }
          rows.count(r => r._3 >= lo && r._3 <= hi).toLong
        case "min_length" =>
          val k = c.sql.split(">= ")(1).takeWhile(_.isDigit).toInt
          rows.count(r => r._2 != null && r._2.length >= k).toLong
      }
      val want = checks.map { c =>
        val ok = okOf(c)
        (c.kind, c.column, c.minPerMille.toLong) ->
          (ok, n.toLong, ok * 1000 >= c.minPerMille.toLong * n)
      }.sortBy { case ((k, cn, _), _) => (k, cn) }
      // the two bounds checks share (kind, column) — compare as sorted
      // multisets of full rows so neither dial can absorb the other
      assert(got.sortBy(r => (r._1, r._2)) === want.sortBy(r => (r._1, r._2)),
        s"round $round mismatch")
    }
  }
}
