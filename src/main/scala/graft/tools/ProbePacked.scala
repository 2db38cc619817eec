package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measure what byte-packing the quantized codes buys (r11 ask #2):
  * writes the same corpus three ways — snapped ARRAY<BIGINT> (the
  * pre-round-12 in-plan form), SQ8 codes as ARRAY<BIGINT> (unpacked),
  * SQ8 codes as packed BINARY (CodesIndex.writeSq8's layout) — and
  * reports on-disk bytes/vector plus the time of a full
  * scan+dequantize+norm pass over each stored form.
  *
  * Usage: runMain graft.tools.ProbePacked <sfDirOrReplica> [repeatFactor]
  * repeatFactor > 1 unions the embeddings table onto itself (vec_id
  * re-keyed) so the probe can run at decade scale without a stored
  * replica. */
object ProbePacked {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(1)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = graft.sources.Tables(spark, dir).embeddings
    val emb =
      if (factor == 1) base
      else (0 until factor).map { i =>
        base.select((col("vec_id") + lit(i.toLong * 10000000L)).as("vec_id"),
          col("embedding"))
      }.reduce(_ unionByName _)
    val n = emb.count()
    val root = java.nio.file.Files.createTempDirectory("graft-packed").toString

    // form 1: snapped int64 arrays (what y14 used to rank against)
    val svPath = s"$root/sv"
    emb.select(col("vec_id"),
        graft.ext.Similarity.snapVec(col("embedding")).as("sv"))
      .write.parquet(svPath)
    // form 2+3: SQ8 codes, unpacked vs packed
    val pkPath = s"$root/packed"
    graft.ext.CodesIndex.writeSq8(emb, pkPath)
    val upPath = s"$root/unpacked"
    val st = graft.ext.CodesIndex.sq8Stats(spark, pkPath)
    spark.read.parquet(pkPath)
      .select(col("vec_id"),
        graft.functions.UnpackBytesLong.unpack_bytes(col("codes")).as("codes"))
      .write.parquet(upPath)

    def bytesOf(p: String): Long = {
      val f = new org.apache.hadoop.fs.Path(p)
      val fs = f.getFileSystem(spark.sessionState.newHadoopConf())
      fs.getContentSummary(f).getLength
    }
    def timed(what: String)(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    // the consumer-side cost: scan the stored form, produce dequantized
    // vectors + norms (y14's corpus side), materialize via noop
    val dvExpr =
      """transform(c, (x, i) ->
        |  element_at(__mn, i + 1) +
        |  x * element_at(__sp, i + 1) div CAST(255 AS BIGINT))""".stripMargin
    def scanPacked(): Unit =
      graft.ext.CodesIndex.sq8Dequantized(spark, pkPath)
        .withColumn("dn", graft.ext.Similarity.normSnapped(col("dv")))
        .write.format("noop").mode("overwrite").save()
    def scanUnpacked(): Unit =
      spark.read.parquet(upPath)
        .select(col("vec_id"), lit(st.mn).as("__mn"), lit(st.span).as("__sp"),
          col("codes").as("c"))
        .selectExpr("vec_id", s"$dvExpr AS dv")
        .withColumn("dn", graft.ext.Similarity.normSnapped(col("dv")))
        .write.format("noop").mode("overwrite").save()
    def scanSv(): Unit =
      spark.read.parquet(svPath)
        .withColumn("dn", graft.ext.Similarity.normSnapped(col("sv")))
        .write.format("noop").mode("overwrite").save()
    def med(body: () => Unit): Double =
      (1 to 3).map(_ => timed("")(body())).sorted.apply(1)
    val (tSv, tUp, tPk) = (med(scanSv _), med(scanUnpacked _), med(scanPacked _))
    println(f"""{"probe":"packed_codes","rows":$n,"sv_bytes_per_vec":${bytesOf(svPath) / n},"unpacked_bytes_per_vec":${bytesOf(upPath) / n},"packed_bytes_per_vec":${bytesOf(pkPath) / n},"scan_sv_s":$tSv%.3f,"scan_unpacked_s":$tUp%.3f,"scan_packed_s":$tPk%.3f}""")
    spark.stop()
  }
}
