package graft

import graft.streaming._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

/** State durability: keyed state survives a query stop/restart from the
  * checkpoint — the Spark analog of Flink's checkpointed state backend
  * (SURVEY.md §2.6 state-backend notes). The memory sink is not
  * checkpoint-recoverable, so the sink is foreachBatch into a buffer.
  */
class RecoverySpec extends SparkTestBase {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("click-counter state survives restart from checkpoint") {
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val got = new java.util.concurrent.ConcurrentLinkedQueue[ClickCount]()
    val in = MemoryStream[Click]
    val counts = StatefulOps.clickCounts(in.toDS())
    def start() = counts.writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[ClickCount], _: Long) =>
        batch.collect().foreach(got.add)
      }
      .start()

    val q1 = start()
    in.addData(Click("u1", 1, "click"), Click("u1", 2, "click"))
    q1.processAllAvailable()
    q1.stop()
    assert(got.size === 2)

    // restart from the SAME checkpoint: offsets + per-key state resume
    val q2 = start()
    in.addData(Click("u1", 3, "click"))
    q2.processAllAvailable()
    q2.stop()

    val all = got.toArray(Array.empty[ClickCount]).sortBy(_.clicks)
    // the post-restart record continues from state count=2 -> emits 3,
    // and the pre-restart batches are not replayed
    assert(all.map(_.clicks).toSeq === Seq(1, 2, 3))
    assert(all.last.message === "u1 has clicked 3 times.")
  }

  test("the funnel state machine resumes from checkpoint: stage timestamps survive restart") {
    val ckpt = Files.createTempDirectory("graft-funnel-ckpt").toString
    val got = new java.util.concurrent.ConcurrentLinkedQueue[FunnelAdvance]()
    val in = MemoryStream[FunnelEvent]
    val adv = StreamFunnel.advances(in.toDS())
    def start() = adv.writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[FunnelAdvance], _: Long) =>
        batch.collect().foreach(got.add)
      }
      .start()

    val q1 = start()
    in.addData(FunnelEvent(1L, 100L, "view", 1))
    q1.processAllAvailable()
    q1.stop()
    assert(got.size === 1)

    // restart from the SAME checkpoint: the stage-1 timestamp must be
    // live again — the click advances to 2 carrying s1 from BEFORE the
    // restart, and batch 0 is not replayed (no duplicate stage-1 row)
    val q2 = start()
    in.addData(FunnelEvent(1L, 250L, "click", 2),
               FunnelEvent(1L, 400L, "purchase", 3))
    q2.processAllAvailable()
    q2.stop()

    val all = got.toArray(Array.empty[FunnelAdvance]).sortBy(_.stage)
    assert(all.map(_.stage).toSeq === Seq(1, 2, 3))
    assert(all.last === FunnelAdvance(1L, 3, Some(100L), Some(250L), Some(400L)))
  }

  test("the streaming index screen resumes from checkpoint: exactly-once pairs across restart") {
    // the operational ingest screen (StreamDedup.againstIndex) killed
    // mid-stream and resumed from its checkpoint must neither re-emit
    // the pre-restart pairs (offsets resume) nor lose the post-restart
    // ones — the stateless stream-static join's exactly-once story is
    // the source offsets + idempotent sink contract
    val pairText1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val pairText2 = "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val indexDocs = Seq(
      (1001L, pairText1), (2001L, pairText2),
      (3000L, (1 to 12).map(i => s"unique$i").mkString(" "))
    ).toDF("doc_id", "text")
    val idx = Files.createTempDirectory("graft-snd-ckpt-idx").toString
    graft.ext.Dedup.writeNeardupIndex(indexDocs, idx)
    val ckpt = Files.createTempDirectory("graft-snd-ckpt").toString
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val in = MemoryStream[(Long, String)]
    val screen = StreamDedup.againstIndex(
      in.toDF().toDF("doc_id", "text"), idx, 0.8)
    def start() = screen.writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.select("batch_id", "corpus_id").as[(Long, Long)]
          .collect().foreach(got.add)
      }
      .start()
    val q1 = start()
    in.addData((1000L, pairText1))
    q1.processAllAvailable(); q1.stop()
    assert(got.toArray(Array.empty[(Long, Long)]).toSeq === Seq((1000L, 1001L)))
    val q2 = start()
    in.addData((2000L, pairText2))
    q2.processAllAvailable(); q2.stop()
    val all = got.toArray(Array.empty[(Long, Long)]).toSeq
    // no duplicate emission of the pre-restart pair, no lost post-restart pair
    assert(all.sorted === Seq((1000L, 1001L), (2000L, 2001L)),
      s"restart must be exactly-once over the emitted pairs: $all")
    graft.core.CacheScope.releaseAll()
  }

  test("streaming curation resumes from checkpoint: dedup state survives restart") {
    val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00").getTime
    val text = (1 to 120).map(i => s"word$i").mkString(" ")
    val other = (1 to 120).map(i => s"fresh$i").mkString(" ")
    val ckpt = Files.createTempDirectory("graft-scur-ckpt").toString
    val got = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
    val in = MemoryStream[(Long, String, java.sql.Timestamp)]
    val curated = StreamCuration.curate(
      in.toDF().toDF("doc_id", "text", "ts"), "ts", "1 hour")
    def start() = curated.writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.select("doc_id").as[Long].collect().foreach(v => got.add(v))
      }
      .start()
    import scala.jdk.CollectionConverters._
    val q1 = start()
    in.addData((1L, text, new java.sql.Timestamp(base)))
    q1.processAllAvailable(); q1.stop()
    assert(got.asScala.toSeq === Seq(1L))
    // restart from the SAME checkpoint: the dedup state store resumes,
    // so a duplicate of the pre-restart text (well inside the watermark
    // horizon) must STILL be suppressed, while a fresh doc passes and
    // the pre-restart batch is not replayed
    val q2 = start()
    in.addData(
      (2L, text, new java.sql.Timestamp(base + 1000)),
      (3L, other, new java.sql.Timestamp(base + 2000)))
    q2.processAllAvailable(); q2.stop()
    val all = got.asScala.toSeq
    assert(all.sorted === Seq(1L, 3L),
      s"dedup state must survive the restart (doc 2 suppressed): $all")
  }

  test("an open session window survives restart: events merge across the checkpoint") {
    val M = 60L * 1000000
    val ckpt = Files.createTempDirectory("graft-sess-ckpt").toString
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Long, Long)]()
    val in = MemoryStream[(Long, Long, Long)]
    val sess = StreamSessions.sessions(
      in.toDF().toDF("user_id", "event_id", "ts_us"))
    def start() = sess.writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.as[(Long, Long, Long, Long)].collect().foreach(got.add)
      }
      .start()
    import scala.jdk.CollectionConverters._
    val q1 = start()
    in.addData((1L, 1L, 0L), (1L, 2L, 10 * M))
    q1.processAllAvailable(); q1.stop()
    // session [0, 10min] is OPEN in the state store at the stop
    val q2 = start()
    in.addData((1L, 3L, 20 * M)) // inside the gap: must MERGE, not restart
    q2.processAllAvailable()
    in.addData((9L, 99L, 10000 * M)) // watermark past everything
    q2.processAllAvailable(); q2.stop()
    // ONE session spanning the restart, its 3 events counted exactly
    // once (no replay of the pre-restart batch, no split at the stop)
    val u1 = got.asScala.toSeq.filter(_._1 == 1L)
    assert(u1 === Seq((1L, 0L, 20 * M, 3L)),
      s"expected one merged exactly-once session across the restart: $u1")
  }

  test("an open quantile window survives restart: the GK summary merges across the checkpoint") {
    // the mid-window state here is a serialized Greenwald-Khanna
    // buffer (TypedImperativeAggregate), not a scalar — the restart
    // must round-trip it through the state store and keep merging,
    // and the closed window's quartiles must still honor the
    // rank-error contract over BOTH sides of the restart
    val Sec = 1000000L
    val ckpt = Files.createTempDirectory("graft-quant-ckpt").toString
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Double, Double, Double, Long)]()
    val in = MemoryStream[(Long, Double)]
    val agg = graft.streaming.StreamQuantiles.windowed(
      in.toDF().toDF("ts_us", "value"))
    def start() = agg.writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.as[(Long, Double, Double, Double, Long)].collect().foreach(got.add)
      }
      .start()
    import scala.jdk.CollectionConverters._
    val q1 = start()
    in.addData((1 to 50).map(i => (i % 10 * Sec, i.toDouble)))
    q1.processAllAvailable(); q1.stop()
    // window [0,10s) is OPEN with a 50-value summary at the stop
    val q2 = start()
    in.addData((51 to 100).map(i => (i % 10 * Sec, i.toDouble)))
    q2.processAllAvailable()
    in.addData(Seq((60 * Sec, 0.0))) // watermark past the window end
    q2.processAllAvailable(); q2.stop()
    val rows = got.asScala.toSeq.filter(_._1 == 0L)
    assert(rows.length === 1, s"one exactly-once window row: $rows")
    val (_, q1v, med, q3v, n) = rows.head
    assert(n === 100L, "values on both sides of the restart counted once")
    val sorted = (1 to 100).map(_.toDouble)
    for ((v, q) <- Seq(q1v -> 0.25, med -> 0.5, q3v -> 0.75)) {
      val err = math.abs(sorted.count(_ <= v).toDouble / 100 - q)
      assert(err <= 1e-3 + 0.01, s"q=$q: $v err $err")
    }
  }

  test("the streaming ANN screen resumes from checkpoint: exactly-once pairs across restart") {
    // StreamAnn.againstIndex is stateless like the dedup screen — its
    // exactly-once story is source offsets + idempotent sink; the
    // collected-centroid literals must also survive the restart path
    // (the restarted query re-plans from the same committed index)
    val dim = 8
    def vec(seed: Int): Seq[Float] =
      (0 until dim).map(d => if (d == seed % dim) 1.0f else 0.01f * seed)
    val corpus = Seq(
      (1001L, vec(1)), (2001L, vec(2)), (3001L, vec(3)), (4001L, vec(4))
    ).toDF("vec_id", "embedding")
    val idx = Files.createTempDirectory("graft-sann-ckpt-idx").toString + "/ivf"
    graft.ext.AnnIndex.write(corpus, idx, k = 4)
    val ckpt = Files.createTempDirectory("graft-sann-ckpt").toString
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val in = MemoryStream[(Long, Seq[Float])]
    val screen = graft.streaming.StreamAnn.againstIndex(
      in.toDF().toDF("vec_id", "embedding"), idx, minCos = 0.9)
    def start() = screen.writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.select("probe_id", "neighbor_id").as[(Long, Long)]
          .collect().foreach(got.add)
      }
      .start()
    val q1 = start()
    in.addData((1L, vec(1)))
    q1.processAllAvailable(); q1.stop()
    assert(got.toArray(Array.empty[(Long, Long)]).toSeq === Seq((1L, 1001L)))
    val q2 = start()
    in.addData((2L, vec(2)))
    q2.processAllAvailable(); q2.stop()
    val all = got.toArray(Array.empty[(Long, Long)]).toSeq
    assert(all.sorted === Seq((1L, 1001L), (2L, 2001L)),
      s"restart must be exactly-once over the emitted pairs: $all")
    graft.core.CacheScope.releaseAll()
  }

  test("the streaming DSIR screen resumes from checkpoint: exactly-once docs, retrain picked up on restart") {
    import org.apache.spark.sql.functions.col
    val corpus = Seq(
      (1L, "good clean helpful text tokens here", "en"),
      (2L, "good clean helpful text tokens again", "en"),
      (3L, "ruido basura tokens raros aqui mismo", "es"),
      (4L, "mas ruido basura sin valor alguno", "es")
    ).toDF("doc_id", "text", "lang")
    val w = graft.ext.Selection.weightTable(corpus, col("lang") === "en")
    // threshold between the EN-like and ES-like score bands
    val scores = graft.ext.Selection.score(corpus, w)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val thr = (math.min(scores(1L), scores(2L)) +
      math.max(scores(3L), scores(4L))) / 2
    assert(math.min(scores(1L), scores(2L)) > thr, s"fixture bands overlap: $scores")
    val ckpt = Files.createTempDirectory("graft-ssel-ckpt").toString
    val got = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
    val in = MemoryStream[(Long, String)]
    val screen = graft.streaming.StreamSelect.dsirScreen(
      in.toDF().toDF("doc_id", "text"), w, thr)
    def start() = screen.writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.select("doc_id").as[Long].collect().foreach(v => got.add(v))
      }
      .start()
    val q1 = start()
    in.addData((10L, "good clean helpful text tokens here"),
      (11L, "ruido basura tokens raros aqui mismo"))
    q1.processAllAvailable(); q1.stop()
    assert(got.toArray(Array.empty[java.lang.Long]).toSeq.map(_.toLong) === Seq(10L),
      "screen must keep the target-like doc and drop the pool-like one")
    // restart from the SAME checkpoint: offsets resume (batch 0 not
    // replayed), and the screen keeps screening
    val q2 = start()
    in.addData((12L, "good clean helpful text tokens again"))
    q2.processAllAvailable(); q2.stop()
    assert(got.toArray(Array.empty[java.lang.Long]).toSeq.map(_.toLong).sorted === Seq(10L, 12L),
      "restart must be exactly-once over the kept docs")
    graft.core.CacheScope.releaseAll()
  }

  test("the temporal join resumes from checkpoint: buffered probe, versions AND the timer survive") {
    import graft.streaming.{StreamTemporal, TemporalMatch, TemporalProbe, TemporalVersion}
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ckpt = Files.createTempDirectory("graft-tj-ckpt").toString
      val got = new java.util.concurrent.ConcurrentLinkedQueue[TemporalMatch]()
      val vIn = MemoryStream[TemporalVersion]
      val pIn = MemoryStream[TemporalProbe]
      val joined = StreamTemporal.join(vIn.toDS(), pIn.toDS(), "1 minute")
      def start() = joined.writeStream
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .foreachBatch { (b: org.apache.spark.sql.Dataset[TemporalMatch], _: Long) =>
          b.collect().foreach(got.add)
        }.start()
      val ms = (m: Long) => new java.sql.Timestamp(m * 60000L)
      val q1 = start()
      vIn.addData(TemporalVersion(1L, ms(1), 10L, "v1"))
      pIn.addData(TemporalProbe(1L, ms(2), 100L))
      q1.processAllAvailable()
      q1.stop()
      assert(got.isEmpty, "the answer is not final before the watermark — nothing may emit")
      // restart: the buffered probe, its version list and the
      // registered event-time timer all come back from the state store
      val q2 = start()
      vIn.addData(TemporalVersion(9L, ms(100), 0L, "s")) // advance the watermark
      q2.processAllAvailable()
      q2.stop()
      val all = got.toArray(Array.empty[TemporalMatch]).toSeq
      assert(all.map(m => (m.key, m.probeId, m.payload)) === Seq((1L, 100L, "v1")),
        s"exactly one finalized answer after restart, got $all")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("kafka source wrapper fails with the connector-missing error (jar not bundled here)") {
    // The spark-sql-kafka connector isn't in /opt/spark/jars (zero-egress
    // container); assert the wrapper reaches Kafka source resolution so
    // the wiring itself is known-correct.
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      StreamSources.kafkaLines(spark, "localhost:29092", "trades", Some("g"))
    }
    assert(e.getMessage.contains("kafka"))
  }
}
