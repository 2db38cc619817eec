package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.Similarity

/** Assignment-quality probe for the coarse-quantizer seed rule: mean
  * exact-int64 L2 quantization distance (after one Lloyd refinement,
  * the y4 recipe) under FIRST-K seeding vs the shipped HASH-ORDERED
  * sample (k lowest (md5(vec_id), vec_id)). First-k is a biased sample
  * on any sorted/clustered corpus; this tool measures what the switch
  * does to the training objective on a given table — the BASELINE.md
  * "assignment-quality delta" evidence.
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

    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), Similarity.snapVec(col("embedding")).as("sv"))
      .persist()

    def l2(a: String, b: String) =
      aggregate(zip_with(col(a), col(b), (x, y) => (x - y) * (x - y)),
        lit(0L), (acc, x) => acc + x)

    def assign(cents: DataFrame): DataFrame =
      vecs.withColumn("c_id", explode(sequence(lit(0L), lit(k - 1L))))
        .join(broadcast(cents), "c_id")
        .withColumn("dist", l2("sv", "cv"))
        .groupBy(col("vec_id"))
        .agg(min_by(struct(col("sv"), col("c_id"), col("dist")),
          struct(col("dist"), col("c_id"))).as("m"))
        .select(col("vec_id"), col("m.sv").as("sv"),
          col("m.c_id").as("cell"), col("m.dist").as("dist"))

    def refine(assigned: DataFrame): DataFrame =
      assigned.select(col("cell"), posexplode(col("sv")).as(Seq("d", "v")))
        .groupBy(col("cell"), col("d"))
        .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
        .withColumn("cm",
          floor(col("s").cast("double") / col("n").cast("double")).cast("long"))
        .groupBy(col("cell"))
        .agg(array_sort(collect_list(struct(col("d"), col("cm")))).as("pairs"))
        .select(col("cell").as("c_id"),
          transform(col("pairs"), p => p.getField("cm")).as("cv"))

    def cost(cents: DataFrame): (Double, Long) = {
      val a = assign(refine(assign(cents)))
      val r = a.agg(avg(col("dist")), count(lit(1))).collect()(0)
      (r.getDouble(0), r.getLong(1))
    }

    val firstK = vecs.filter(col("vec_id") < k)
      .select(col("vec_id").cast("long").as("c_id"), col("sv").as("cv"))
    val order = Seq(col("__h"), col("vec_id"))
    val hashK = vecs
      .withColumn("__h", md5(col("vec_id").cast("string")))
      .orderBy(order: _*).limit(k)
      .select((row_number().over(Window.orderBy(order: _*)) - 1)
        .cast("long").as("c_id"), col("sv").as("cv"))

    val (cF, n) = cost(firstK)
    val (cH, _) = cost(hashK)
    println(f"""{"metric":"seed_quality","sf":"$dir","k":$k,"n_vecs":$n,"mean_l2_firstk":$cF%.1f,"mean_l2_hashk":$cH%.1f,"delta_pct":${100.0 * (cH - cF) / cF}%.2f}""")
    spark.stop()
  }
}
