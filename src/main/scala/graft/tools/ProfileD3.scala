package graft.tools

import graft.core.GraftSession
import graft.ext.Dedup
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Stage-level timing for the near-dup pipeline (dev tool). */
object ProfileD3 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = Tables(spark, dir).documents
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val mode = args.lift(1).getOrElse("md5")
    val sigs = Dedup.minhashSignatures(docs, hashMode = mode).persist()
    time(s"sigs[$mode]")(sigs.count())
    val cand = Dedup.candidatePairs(sigs).persist()
    time("cand")(cand.count())
    val ver = Dedup.verifyJaccard(docs, cand, 0.8)
    time("verify")(ver.count())
    spark.stop()
  }
}
