package graft.tools

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.Dedup
import graft.streaming.StreamClusters

/** The streaming label maintainer's STEADY-STATE publish cost, measured
  * (r15 verdict #1 + #5): drive N consecutive armed micro-batches at
  * the zipf decade through BOTH publish modes over the same standing
  * index and seed labels, and price each trigger's wall time and
  * PUBLISH I/O separately.
  *
  * The hypothesis under test: replace-mode publish is O(standing
  * labels) per trigger (the whole artifact is rewritten and swapped
  * every micro-batch — its cost GROWS with the label corpus and never
  * with the batch), while delta-mode publish is O(changed labels)
  * (one committed `delta=<batchId>` dir; the base is never rewritten),
  * so at the 100 TB design point only the delta mode has a bounded
  * per-trigger steady state. The probe reports, per batch: maintainer
  * wall seconds, bytes written by the publish (replace: the full
  * artifact; delta: the delta dir), and the standing label count —
  * flat-vs-growing publish bytes against a growing label corpus is the
  * A/B the verdict asks for.
  *
  * Usage: runMain graft.tools.ProbeStreamPublish [zipfDir] [cap] [nBatches]
  */
object ProbeStreamPublish {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft-sf100z")
    val cap = args.drop(1).headOption.map(_.toInt).getOrElse(500)
    val nBatches = args.drop(2).headOption.map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def dirBytes(p: String): Long = {
      val path = new Path(p)
      val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
      if (!fs.exists(path)) 0L
      else fs.getContentSummary(path).getLength
    }
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    println(s"[streampub] corpus=${docs.count()} docs, cap=$cap, " +
      s"batches=$nBatches")
    val root = java.nio.file.Files
      .createTempDirectory("graft-streampub").toString
    val idxPath = s"$root/idx"
    val (_, tIdx) = timed {
      Dedup.writeNeardupIndex(docs.filter(col("doc_id") % 5 =!= 0),
        idxPath, "text", "doc_id", cap)
    }
    println(f"[streampub] armed index build: $tIdx%.1f s")
    val index = Dedup.readNeardupIndex(spark, idxPath)
    val (seed, tSeed) = timed {
      val pairs = Dedup.verifyJaccardOnShingles(
          index.select(col("doc_id"), col("sh")),
          Dedup.candidatePairs(index), 0.8)
        .select(col("a_id"), col("b_id"))
      val l = Dedup.connectedComponents(pairs)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      l.count()
      l
    }
    println(f"[streampub] seed labels (CC over capped-index pairs): $tSeed%.1f s")

    // both modes start from the identical committed seed
    val repPath = s"$root/labels-replace"
    graft.core.IndexStore.ensure(spark, repPath) { scratch =>
      seed.write.mode("overwrite").parquet(scratch)
    }
    val logPath = s"$root/labels-log"
    graft.ext.Upsert.init(seed.withColumn("ver", lit(0L)),
      logPath, "doc_id", Seq("ver"), n = 16)
    seed.unpersist()

    // the ingest side (doc_id % 5 === 0) split into N consecutive
    // micro-batches by doc id — each ~1/N of the stream
    println("[streampub] batch | replace_s | delta_s | replace_pub_MB | " +
      "delta_pub_MB | labels")
    (0 until nBatches).foreach { b =>
      val batch = docs
        .filter(col("doc_id") % 5 === 0 &&
          pmod(floor(col("doc_id") / 5), lit(nBatches)) === b)
        .select(col("doc_id"), col("text"))
      val (_, tRep) = timed {
        StreamClusters.labelMaintainer(idxPath, repPath, 0.8,
          maxBucket = cap, skewMode = "drop")(batch, b.toLong)
      }
      val repBytes = dirBytes(repPath) // the publish rewrote ALL of it
      val (_, tDelta) = timed {
        StreamClusters.labelMaintainer(idxPath, logPath, 0.8,
          maxBucket = cap, skewMode = "drop", publish = "delta")(
          batch, b.toLong)
      }
      val deltaBytes = dirBytes(s"$logPath/delta=$b")
      val nLabels = StreamClusters.readLabels(spark, logPath).count()
      val nRep = StreamClusters.readLabels(spark, repPath).count()
      assert(nLabels == nRep,
        s"mode divergence at batch $b: delta view $nLabels vs replace $nRep")
      println(f"[streampub] $b%5d | $tRep%9.1f | $tDelta%7.1f | " +
        f"${repBytes / 1e6}%14.1f | ${deltaBytes / 1e6}%12.3f | $nLabels%d")
      graft.core.CacheScope.releaseAll()
      spark.catalog.clearCache()
    }
    // the cadence fold the runbook schedules, priced once at the end
    val (folded, tFold) = timed {
      StreamClusters.compactLabels(spark, logPath)
    }
    println(f"[streampub] cadence compact: folded $folded deltas in $tFold%.1f s")
    spark.stop()
  }
}
