package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.Similarity
import graft.queries.SimilarityQueries

/** Assignment-quality probe for the coarse-quantizer seed rule: mean
  * exact-int64 L2 quantization distance (after one Lloyd refinement,
  * the y4 recipe) under FIRST-K seeding vs the shipped HASH-ORDERED
  * sample. The shipped rule, the assignment argmin, and the Lloyd
  * refine are the PRODUCTION implementations
  * (SimilarityQueries.seedCentroids / assignToCells / lloydRefine), so
  * this measurement cannot drift from the code it describes; only the
  * retired first-k rule is reproduced inline (it no longer exists in
  * production). Output is the BASELINE.md "assignment-quality delta"
  * evidence.
  *
  * Usage: runMain graft.tools.SeedQuality <sfDir> [k]
  */
object SeedQuality {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val k = if (args.length > 1) args(1).toInt else 16
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val vecs = SimilarityQueries.snapped(
        spark.read.parquet(s"$dir/embeddings.parquet"), "vec_id", "sv", "nrm")
      .persist()

    // final-assignment mean L2 after the production recipe: seed ->
    // assign -> one Lloyd refine -> re-assign. assignToCells drops the
    // distance column, so it is recomputed with the same exact-int64
    // expression against the refined centroids.
    def cost(cents: DataFrame): (Double, Long) = {
      val refined = SimilarityQueries.lloydRefine(
        SimilarityQueries.assignToCells(vecs, cents, k))
      val r = SimilarityQueries.assignToCells(vecs, refined, k)
        .join(refined.select(col("c_id").as("cell"), col("cv")), "cell")
        .withColumn("dist",
          graft.functions.L2DistanceLong.l2_long(col("sv"), col("cv")))
        .agg(avg(col("dist")), count(lit(1))).collect()(0)
      (r.getDouble(0), r.getLong(1))
    }

    // the RETIRED rule, kept only here as the comparison point
    val firstK = vecs.filter(col("vec_id") < k)
      .select(col("vec_id").cast("long").as("c_id"),
        col("sv").as("cv"), col("nrm").as("cn"))
    val hashK = SimilarityQueries.seedCentroids(vecs, k)

    val (cF, n) = cost(firstK)
    val (cH, _) = cost(hashK)
    println(f"""{"metric":"seed_quality","sf":"$dir","k":$k,"n_vecs":$n,"mean_l2_firstk":$cF%.1f,"mean_l2_hashk":$cH%.1f,"delta_pct":${100.0 * (cH - cF) / cF}%.2f}""")
    spark.stop()
  }
}
