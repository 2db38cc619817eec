package graft.tools

import org.apache.spark.sql.functions._

import graft.core.GraftSession
import graft.ext.{CodesIndex, Similarity}
import graft.sources.Tables

/** Size the SQ8 rebuild cadence the way ProbeAnnCadence sizes the IVF
  * one — by measuring what an append-only index LOSES under drift and
  * what one cadence rebuild buys back. The codes tier's failure mode is
  * different from IVF's (no recall cliff, no hot cell): appended
  * vectors encode against the STANDING min/span, so components outside
  * the fitted range SATURATE at the range edge and quantization error
  * grows with the drift magnitude — silently, per component. The
  * metrics that matter:
  *
  *   sat_ppm   saturated components per million among the appended
  *             batch's codes (0 or 255 where the true value lies
  *             beyond the edge)
  *   err_q     mean |dequantized − true snapped| per component over the
  *             appended batch, in snapped (1e-6) units — the bounded
  *             error the scaladoc promises, made a number
  *
  * Regimes mirror ProbeAnnCadence: stationary (appends drawn from the
  * fitted distribution — error stays at the ~span/510 rounding floor,
  * rebuild buys ~nothing) and drifted (appends shifted +0.5/dim — the
  * out-of-range half saturates hard until the rebuild re-fits the
  * stats over the combined corpus).
  *
  * Usage: runMain graft.tools.ProbeSq8Drift [sfDir] [nBatches] [regime]
  */
object ProbeSq8Drift {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nBatches = args.lift(1).map(_.toInt).getOrElse(8)
    val regime = args.lift(2).getOrElse("drifted")
    val emb = Tables(spark, dir).embeddings
    val path = java.nio.file.Files
      .createTempDirectory("graft-sq8-drift").toString + "/idx"

    // 2-column projection throughout: the table carries extra columns
    // (label) the codes tier ignores, and the rebuild unions base with
    // the drifted batches' synthesized rows
    val appendMass = (regime match {
      case "stationary" => emb.filter(col("vec_id") % 2 === 1)
      case "drifted" => emb.filter(col("vec_id") % 2 === 1)
        .select((-col("vec_id") - 1).as("vec_id"),
          expr("transform(embedding, x -> x + 0.5F)").as("embedding"))
      case other => sys.error(s"unknown regime $other")
    }).select(col("vec_id"), col("embedding"))
    val base = emb.filter(col("vec_id") % 2 === 0)
      .select(col("vec_id"), col("embedding"))
    CodesIndex.writeSq8(base, path)
    val appended = scala.collection.mutable.Buffer.empty[
      org.apache.spark.sql.DataFrame]

    /** err/saturation of the CURRENT index rows restricted to the rows
      * of `batchIds`' true vectors (joined back by vec_id). */
    def measure(tag: String, over: org.apache.spark.sql.DataFrame): Unit = {
      if (over.isEmpty) return
      val truth = over.select(col("vec_id"),
        Similarity.snapVec(col("embedding")).as("tv"))
      val m = CodesIndex.sq8Dequantized(spark, path)
        .join(truth, "vec_id")
        .select(posexplode(arrays_zip(col("dv"), col("tv")))
          .as(Seq("p", "z")))
        .agg(
          avg(abs(col("z.dv") - col("z.tv"))).as("err_q"),
          avg(when(abs(col("z.dv") - col("z.tv")) > 50000, 1.0)
            .otherwise(0.0)).as("far_frac"),
          count(lit(1)).as("n_comp"))
        .head()
      println(f"""{"probe":"sq8_drift","regime":"$regime","step":"$tag","err_q":${m.getDouble(0)}%.1f,"far_frac":${m.getDouble(1)}%.4f,"components":${m.getLong(2)}}""")
    }

    (0 until nBatches).foreach { i =>
      // integer div (the ProbeAnnCadence slicing): float `/` would make
      // odd-id slices silently empty
      val batch = appendMass.filter(
        expr(s"(abs(vec_id) div 2) % $nBatches") === i)
      CodesIndex.appendSq8(batch, path)
      appended += batch
    }
    val allAppended = appended.reduce(_ unionByName _)
    measure(s"after_${nBatches}_appends(appended rows)", allAppended)
    measure("after_appends(base rows)", base)
    // one cadence rebuild over the combined corpus
    CodesIndex.rebuildSq8(spark, path, base.unionByName(allAppended))
    measure("after_rebuild(appended rows)", allAppended)
    measure("after_rebuild(base rows)", base)
    spark.stop()
  }
}
