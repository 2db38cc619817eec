package graft.tools
import graft.sources.Tables
import org.apache.spark.sql.functions._
object ProfileOverlap {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(32)
    val dir = args.headOption.getOrElse("/tmp/graft-sf1")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables(spark, dir).documents
    val sh = graft.ext.Dedup.shingleFrame(docs).persist()
    time("shingleFrame")(sh.count())
    val ss = sh.join(docs.select(col("doc_id"), col("source")), "doc_id")
      .select(explode(col("sh")).as("shingle"), col("source"))
    time("explode count")(ss.count())
    val dedup = ss.groupBy(col("shingle"), col("source")).agg(count(lit(1))).persist()
    val n = time("dedup agg")(dedup.count())
    println("unique (shingle, source): " + n)
    sh.unpersist(); dedup.unpersist()
    time("full query noop")(
      graft.queries.AnalysisQueries.sourceOverlap(spark, dir)
        .write.format("noop").mode("overwrite").save())
    time("full query again")(
      graft.queries.AnalysisQueries.sourceOverlap(spark, dir)
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
