package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesizes a larger scale factor from an existing testdata directory
  * by unioning `factor` key-shifted replicas of every fact table —
  * referential integrity preserved by applying consistent offsets to
  * every foreign key (replica i shifts custkeys by i*maxCust, orderkeys
  * by i*maxOrder, …). Dimension tables (region, nation) copy as-is.
  * Document text is perturbed per replica so dedup clusters stay
  * bounded (cluster size = factor, not corpus-sized).
  *
  * Usage: runMain graft.tools.ScaleUp <srcDir> <outDir> <factor> [tables] [--zipf]
  * `tables` is an optional comma-separated subset to synthesize (e.g.
  * "documents,embeddings" for the sf100-equivalent index-query probe,
  * where the full fact schema would waste tens of GB the probe never
  * reads); omitted = all tables + the media fixture.
  * Used for the BASELINE.md scaling probe (sf0.1 -> sf1-equivalent);
  * correctness gates keep using the driver-provided parquet unmodified.
  *
  * `--zipf` switches the replica synthesis from uniform to HEAVY-TAILED
  * — the fixture the skew guards exist for. Uniform replicas produced
  * three vacuous-guard probe findings in a row (heavy-hitters admitting
  * 100% then 0%, the winnow df-cap never capping, C4 line rules with
  * nothing to cut), because every key is equally frequent. Zipf mode:
  *  - documents: every replica doc gets a BOILERPLATE sentence appended
  *    whose template index is log-uniform in [1, 1000] (P(k) ∝ 1/k) —
  *    template 1 lands in ~10% of docs, the tail is rare. Identical
  *    template text across docs ⇒ genuinely heavy shingles for the CMS
  *    screen and genuinely high-df winnow fingerprints for the df-cap.
  *  - events: user_id is REASSIGNED log-uniformly over the scaled user
  *    space (P(user k) ∝ 1/k), so the top user absorbs ~1/ln(U) of ALL
  *    events — the bot tail that makes per-user collect_list rows
  *    unbounded and the funnel's bounded mode necessary.
  * Both draws are hash-deterministic (xxhash64 of the row key and
  * replica index): re-running produces the same fixture. Zipf replicas
  * are probe fixtures only — referential integrity holds (boilerplate
  * only appends text; reassigned user ids stay within the scaled
  * customer key space) but cross-sf comparability to uniform replicas
  * does not.
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val (Array(srcDir, outDir, factorStr), restAll) = args.splitAt(3)
    val factor = factorStr.toInt
    val zipf = restAll.contains("--zipf")
    val rest = restAll.filterNot(_ == "--zipf")
    val only: Option[Set[String]] = rest.headOption.map(_.split(",").toSet)
    def wanted(name: String): Boolean = only.forall(_.contains(name))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.ts is parquet TIMESTAMP(NANOS) — read as raw long (same
      // normalization Tables.events applies); the replica is written as
      // plain INT64 nanos, which downstream reads handle identically
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def tbl(name: String): DataFrame =
      spark.read.parquet(s"$srcDir/$name.parquet")
    def maxOf(name: String, key: String): Long =
      tbl(name).agg(max(col(key))).collect()(0).getLong(0) + 1

    // lazy so a table-filtered run never scans tables it won't write
    lazy val cMax = maxOf("customer", "c_custkey")
    lazy val sMax = maxOf("supplier", "s_suppkey")
    lazy val pMax = maxOf("part", "p_partkey")
    lazy val oMax = maxOf("orders", "o_orderkey")
    lazy val eMax = maxOf("events", "event_id")
    lazy val dMax = maxOf("documents", "doc_id")
    lazy val vMax = maxOf("embeddings", "vec_id")

    /** Union of factor replicas, with the given per-replica column
      * rewrites applied ( column -> base offset ). */
    def replicate(name: String, shifts: Map[String, Long],
                  extra: (DataFrame, Int) => DataFrame = (df, _) => df): Unit = {
      val src = tbl(name)
      val out = (0 until factor).map { i =>
        val shifted = shifts.foldLeft(src) { case (df, (c, base)) =>
          df.withColumn(c, col(c) + lit(i * base))
        }
        extra(shifted, i)
      }.reduce(_ unionAll _)
      out.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
    }

    // dims copy as-is
    Seq("region", "nation").filter(wanted).foreach { n =>
      tbl(n).write.mode("overwrite").parquet(s"$outDir/$n.parquet")
    }
    if (wanted("customer")) replicate("customer", Map("c_custkey" -> cMax))
    if (wanted("supplier")) replicate("supplier", Map("s_suppkey" -> sMax))
    if (wanted("part")) replicate("part", Map("p_partkey" -> pMax))
    // o_totalprice gets a deterministic SUB-MICRO-DOLLAR jitter on the
    // replicas (i=0 keeps exact base values): plain replication caps
    // the price domain at the base corpus's ~150k distinct values, so
    // any distinct-value-sized aggregation state (exact percentile's
    // counts map, mode maps) silently stays base-scale however many
    // rows the replica holds — the same fixture-degeneration class the
    // zipf mode fixes for frequency skew, here for VALUE CARDINALITY.
    // The offset is < 1e-6 dollars (prices are cent-grained, >= 1), so
    // no threshold filter, join, or sum at analytic precision changes
    // observably; it only makes the continuous domain actually
    // continuous at scale.
    if (wanted("orders"))
      replicate("orders", Map("o_orderkey" -> oMax, "o_custkey" -> cMax),
        (df, i) =>
          if (i == 0) df
          else df.withColumn("o_totalprice", col("o_totalprice") +
            pmod(xxhash64(col("o_orderkey"), lit(i)), lit(1000000L))
              .cast("double") / 1e12))
    if (wanted("lineitem"))
      replicate("lineitem", Map("l_orderkey" -> oMax, "l_partkey" -> pMax,
        "l_suppkey" -> sMax))
    // log-uniform draw in [1, bound] from a deterministic hash: if
    // u ~ U[0,1) then floor(bound^u) has P(k) ∝ ~1/k — the zipf tail
    def logUniform(seedCols: Column, i: Int, bound: Double): Column = {
      val u = pmod(xxhash64(seedCols, lit(i)), lit(1000000L))
        .cast("double") / 1000000.0
      floor(pow(lit(bound), u)).cast("long")
    }

    if (wanted("events")) {
      if (zipf) {
        // heavy-tailed activity: reassign user_id log-uniformly over the
        // scaled user space — user 1 absorbs ~1/ln(U) of all events
        val totalUsers = (cMax * factor).toDouble
        replicate("events", Map("event_id" -> eMax), (df, i) =>
          df.withColumn("user_id", logUniform(col("event_id"), i, totalUsers)))
      } else
        replicate("events", Map("event_id" -> eMax, "user_id" -> cMax))
    }
    if (wanted("documents"))
      replicate("documents", Map("doc_id" -> dMax), (df, i) =>
        if (zipf) {
          // boilerplate template k (zipf-ranked), identical 15-word text
          // for every doc that draws the same k — heavy shingles and
          // high-df winnow fingerprints concentrate on small k
          val k = logUniform(col("doc_id"), i, 1000.0)
          df.withColumn("__bk", k)
            .withColumn("text", concat(col("text"), lit(" "),
              expr("concat_ws(' ', transform(sequence(0, 14), " +
                "j -> concat('zb', pmod(__bk * 13 + j * 7, 997))))"),
              lit(s" r$i")))
            .drop("__bk")
        } else if (i == 0) df
        else df.withColumn("text", concat(col("text"), lit(s" r$i"))))
    if (wanted("embeddings")) replicate("embeddings", Map("vec_id" -> vMax))

    // true-binary media fixture over the scaled corpus, so
    // x_multimodal_meta at probe scale decodes real parquet BINARY
    // instead of a string cast (the driver dirs carry no media table);
    // a table-filtered run must name "media" (and "documents") to get it
    if (wanted("media") && wanted("documents"))
      graft.ext.Multimodal
        .mediaFixtureFrame(spark.read.parquet(s"$outDir/documents.parquet"))
        .write.mode("overwrite").parquet(s"$outDir/media.parquet")

    println(s"scaled $srcDir x$factor -> $outDir")
    spark.stop()
  }
}
