package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Behavioral counters on a ZIPF replica (`ScaleUp --zipf`) — the
  * companion to `ProbeQueries` timings for the three guards whose
  * value a UNIFORM fixture cannot show (the round-8/9 probe findings:
  * heavy-hitter screen admitting 100% then 0%, the winnow df-cap
  * never capping, per-user event lists never skewing):
  *
  *  - heavy-shingle screen: what fraction of occurrences the CMS
  *    screen ADMITS at the 1% fractional threshold — the sketch's
  *    whole point is admitting a small candidate slice on a
  *    heavy-tailed vocabulary (uniform: 0% or 100%, both vacuous);
  *  - winnow fingerprint df: bucket occupancy against the d15 cap
  *    (maxBucket = 2) — buckets over the cap and rows inside them,
  *    i.e. what the cap actually drops here;
  *  - funnel skew: per-user event counts (max, p99, top-user share) —
  *    the bot user whose history makes the collect_list funnel's row
  *    width unbounded while a11_funnel_bounded's stays O(1).
  *
  * Usage: runMain graft.tools.ProbeZipf <zipfDir>
  * Prints one JSON line; never writes BENCH_FULL.json. */
object ProbeZipf {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ext.{CountMin, Dedup}

    val out = new StringBuilder(s"""{"probe_zipf":"$dir"""")

    // ---- heavy-shingle screen admission (xxh64 — the production twin;
    // admission is hash-family-independent up to CMS collision noise)
    val docs = graft.sources.Tables(spark, dir).documents
    val nDocs = docs.count()
    val threshold = math.ceil(0.01 * nDocs).toLong
    val occ = graft.core.CacheScope.track(
      Dedup.shingleFrame(docs)
        .select(explode_outer(col("sh")).as("ng"))
        .filter(col("ng").isNotNull).persist())
    val totalOcc = occ.count()
    val sketch = CountMin.build(occ, "xxh64")
    val est = CountMin.stagedEstimate(occ, sketch, "xxh64")
    val admitted = est.filter(col("est") >= threshold).count()
    val heavy = est.filter(col("est") >= threshold)
      .groupBy(col("ng")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= threshold).count()
    graft.core.CacheScope.releaseAll()
    out ++= s""","docs":$nDocs,"df_threshold":$threshold"""
    out ++= s""","shingle_occurrences":$totalOcc,"screen_admitted":$admitted"""
    out ++= f""","admit_frac":${admitted.toDouble / totalOcc}%.4f"""
    out ++= s""","heavy_shingles":$heavy"""

    // ---- winnow df-cap occupancy at the d15 dial (maxBucket = 2)
    val fp = graft.core.CacheScope.track(
      Dedup.winnowFingerprints(docs, 4, 4).persist())
    val totalFp = fp.count()
    val occ2 = fp.groupBy(col("h")).agg(count(lit(1)).as("n"))
    val Array(maxB, over, rowsIn) = occ2.agg(
        max(col("n")), sum(when(col("n") > 2, 1L).otherwise(0L)),
        sum(when(col("n") > 2, col("n")).otherwise(0L)))
      .collect()(0).toSeq.map(v => Option(v).fold(0L)(_.toString.toLong))
      .toArray
    graft.core.CacheScope.releaseAll()
    out ++= s""","winnow_fps":$totalFp,"winnow_max_bucket":$maxB"""
    out ++= s""","winnow_buckets_over_cap":$over,"winnow_rows_dropped":$rowsIn"""

    // ---- funnel per-user skew
    val perUser = graft.sources.Tables(spark, dir).events
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
    // total = sum of the per-user counts — no second scan of the
    // (at sf100z: 100M-row) events table
    val Array(users, maxU, p99, totalEv) = perUser.agg(
        count(lit(1)), max(col("n")),
        expr("approx_percentile(n, 0.99)"), sum(col("n")))
      .collect()(0).toSeq.map(v => Option(v).fold(0L)(_.toString.toLong))
      .toArray
    out ++= s""","users":$users,"events":$totalEv,"max_user_events":$maxU"""
    out ++= s""","p99_user_events":$p99"""
    out ++= f""","top_user_share":${maxU.toDouble / totalEv}%.4f}"""

    println(out.result())
    spark.stop()
  }
}
