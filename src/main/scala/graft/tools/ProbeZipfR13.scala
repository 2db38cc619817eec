package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-13 zipf coverage (r12 ask #6) for the round-12 tiers, two
  * parts:
  *
  * `bforms` — the precomputed-cluster CONSUMERS under a hot cluster.
  * The uniform-decade ladder (BASELINE r12) proved d8b/d13b/d18b
  * corpus-linear; the open question was label SKEW: one cluster
  * holding ~10% of the corpus (a boilerplate/template family after
  * near-dup clustering). The probe builds that label frame DIRECTLY —
  * the consumers' contract is "any (doc_id, cluster_id) frame", so the
  * skew scenario doesn't need the LSH pipeline to produce it — and
  * times each consumer over the 500k-doc zipf fixture. What could
  * break: the per-cluster argmax (50k rows into one group) and the
  * label/best joins. Expectation to test: the argmax is a hash agg
  * with map-side partials (no single-reducer row pileup) and the joins
  * key on doc_id (unique) or best_id (unique), so NO SkewGuard arm
  * should be needed — unlike the pair-screen side, where hot buckets
  * are quadratic.
  *
  * `sq8` — SQ8 under zipf-skewed COMPONENT distributions. Fit time is
  * scan-shaped regardless; what skew actually degrades is CODE
  * UTILIZATION: per-dim min/max stats fitted on a heavy-tailed corpus
  * are stretched by the outlier rows, so the mass of the corpus
  * quantizes into a handful of levels. Measured: per-dim distinct
  * codes used and the top-code share, raw stats vs percentile-CLIPPED
  * stats (p1/p99 fit, outliers saturating through sq8Encode's clamp —
  * the machinery the append path already has), plus the saturated
  * component fraction the clip costs.
  *
  * Usage: runMain graft.tools.ProbeZipfR13 [bforms|sq8|all] [docsDir] [embDir]
  */
object ProbeZipfR13 {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("all")
    val docsDir = args.drop(1).headOption.getOrElse("/tmp/graft-sf10z")
    val embDir = args.drop(2).headOption.getOrElse("/tmp/graft-sf100v")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (mode == "bforms" || mode == "all") bforms(spark, docsDir)
    if (mode == "sq8" || mode == "all") sq8(spark, embDir)
    spark.stop()
  }

  private def timed3(what: String)(f: => Long): Unit = {
    val ts = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    val med = ts.map(_._1).sorted.apply(1)
    println(f"[zipf13] $what: $med%.2f s (rows=${ts.head._2})")
  }

  private def bforms(spark: SparkSession, dir: String): Unit = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val n = docs.count()
    // hot-cluster label frame: cluster 0 = every 10th doc (~10% of the
    // corpus in ONE cluster), plus a realistic small-cluster tail
    // (pairs: doc_id % 10 in {1,2} pair up by doc_id / 20). ~30% of
    // docs clustered, the rest pass through unclustered — the shape a
    // template-heavy web corpus produces.
    val labels = docs.select(col("doc_id"))
      .withColumn("cluster_id",
        when(col("doc_id") % 10 === 0, lit(0L))
          .when(col("doc_id") % 10 === 1, (col("doc_id") / 20).cast("long") * 100 + 1)
          .when(col("doc_id") % 10 === 2, (col("doc_id") / 20).cast("long") * 100 + 1)
          .otherwise(lit(null).cast("long")))
      .filter(col("cluster_id").isNotNull)
      .persist()
    val hot = labels.groupBy(col("cluster_id")).count()
      .agg(max(col("count"))).head().getLong(0)
    println(s"[zipf13] bforms: $n docs, ${labels.count()} clustered, " +
      s"hottest cluster = $hot docs (${100.0 * hot / n}%)")
    timed3("d8b apply (hot cluster)") {
      graft.queries.DedupQueries.dedupApplyOn(docs, labels)
        .write.format("noop").mode("overwrite").save(); n
    }
    timed3("d13b apply-best (hot cluster)") {
      graft.queries.DedupQueries.dedupApplyBestOn(docs, labels)
        .write.format("noop").mode("overwrite").save(); n
    }
    val prio = docs.select(col("source")).distinct()
      .withColumn("prio", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("source")))
        .cast("long"))
    timed3("d18b cross-source (hot cluster)") {
      graft.ext.Curation.clusterBySource(docs, labels, prio)
        .write.format("noop").mode("overwrite").save(); n
    }
    timed3("d10b cluster-best (hot cluster)") {
      graft.queries.DedupQueries.clusterBestOn(docs, labels)
        .write.format("noop").mode("overwrite").save(); n
    }
    labels.unpersist()
  }

  private def sq8(spark: SparkSession, dir: String): Unit = {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val n = emb.count()
    // two heavy-tail shapes: a continuous zipf-ish ramp (every row
    // scaled 1..~100x — a genuinely wide dynamic range) and the classic
    // outlier corpus (1% of rows at 100x, the rest untouched — the
    // shape where robust stats fully recover the mass)
    val ramp = emb.select(col("vec_id"),
      expr("transform(embedding, x -> x * CAST(pow(10.0, CAST(vec_id % 100 AS DOUBLE) / 49.5) AS FLOAT))")
        .as("embedding"))
    val outlier = emb.select(col("vec_id"),
      expr("transform(embedding, x -> CASE WHEN vec_id % 100 = 0 THEN x * CAST(100.0 AS FLOAT) ELSE x END)")
        .as("embedding"))
    println(s"[zipf13] sq8: $n vectors; shapes: ramp 1..~100x, outlier 1%@100x")

    def buildAndProfile(tag: String, source: DataFrame,
                        clipPct: Double): Unit = {
      val root = java.nio.file.Files
        .createTempDirectory(s"graft-zipf-sq8-$tag").toString + "/idx"
      val sv = source.select(col("vec_id"),
        graft.ext.Similarity.snapVec(col("embedding")).as("sv"))
      val t0 = System.nanoTime()
      if (clipPct <= 0) {
        graft.ext.CodesIndex.writeSq8(source, root)
      } else {
        // percentile-clipped fit: stats from the p/(1-p) quantiles of
        // each dim, codes CLAMPED (the sq8Encode saturation path) —
        // the robust-stats production form
        graft.ext.CodesIndex.writeSq8Clipped(source, root, clipPct)
      }
      println(f"[zipf13] sq8 $tag build: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      // code-utilization profile off the packed artifact
      val codes = graft.core.IndexStore.read(spark, root, "SQ8", "writeSq8")
        .select(posexplode(
          graft.functions.UnpackBytesLong.unpack_bytes(col("codes")))
          .as(Seq("d", "c")))
      val prof = codes.groupBy(col("d"), col("c")).count()
        .groupBy(col("d"))
        .agg(count(lit(1)).as("levels"),
          (max(col("count")).cast("double") / sum(col("count"))).as("top_share"))
        .agg(avg(col("levels")), avg(col("top_share"))).head()
      println(f"[zipf13] sq8 $tag utilization: avg levels/dim ${prof.getDouble(0)}%.1f / 256, avg top-code share ${prof.getDouble(1)}%.3f")
      // resolution felt by the MASS of the corpus: mean |dv - sv| over
      // the unstretched rows (vec_id % 100 in [1, 50) — excludes the
      // outlier slot and the ramp's high end in both shapes)
      val err = graft.ext.CodesIndex.sq8Dequantized(spark, root)
        .join(sv, "vec_id")
        .filter(col("vec_id") % 100 >= 1 && col("vec_id") % 100 < 50)
        .select(expr(
          "aggregate(zip_with(dv, sv, (a, b) -> abs(a - b)), 0L, (acc, x) -> acc + x)")
          .as("e"))
        .agg(avg(col("e").cast("double"))).head().getDouble(0)
      println(f"[zipf13] sq8 $tag mass mean |dequant err| per vector: $err%.0f")
    }
    buildAndProfile("uniform-raw", emb, 0)
    buildAndProfile("ramp-raw", ramp, 0)
    buildAndProfile("ramp-clipped-p1", ramp, 0.01)
    buildAndProfile("outlier-raw", outlier, 0)
    buildAndProfile("outlier-clipped-p1", outlier, 0.01)
  }
}
