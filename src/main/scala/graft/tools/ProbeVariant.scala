package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measure the VARIANT multi-field claim (r11 ask #3): BASELINE's
  * round-11 row showed variant_get beating get_json_object 1.3× at ONE
  * extracted field and STATED the multi-field advantage from the
  * execution model (parse once vs parse per field) without measuring
  * it. This probe builds a 5-field props fixture at decade scale and
  * times ALL FOUR extraction idioms Spark offers, because the honest
  * comparison set is wider than the ask's two:
  *
  *   gjo      get_json_object × 5      — parse per FIELD (the naive form)
  *   map      from_json MAP once + element_at × 5   — parse once,
  *            dynamic keys (what t5's CDC diff actually uses)
  *   struct   from_json STRUCT once + field refs × 5 — parse once,
  *            static schema (the classic answer when fields are known)
  *   variant  parse_json once + variant_get × 5     — parse once into
  *            the shredded binary, schema-on-read per field
  *
  * Each form projects the same 5 typed columns and materializes via
  * noop; 3-rep medians. Fixture: one 5-field JSON object per event
  * (long, long, string, double, long — deterministic from event_id),
  * written once to /tmp and reused.
  *
  * Usage: runMain graft.tools.ProbeVariant [eventsDir] [reps]
  */
object ProbeVariant {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft-sf10")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val fixture = "/tmp/graft-variant5"
    if (!graft.core.IndexStore.isCommitted(spark, fixture)) {
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("event_id"),
          format_string(
            """{"k":%d,"a":%d,"b":"u%d","c":%d.%02d,"d":%d}""",
            col("event_id") % 97, col("event_id") % 1009,
            col("event_id") % 50, col("event_id") % 13,
            col("event_id") % 100, col("event_id") % 7)
            .as("props"))
        .write.mode("overwrite").parquet(fixture)
    }
    val src = spark.read.parquet(fixture)
    val n = src.count()

    def gjo(df: DataFrame): DataFrame = df.select(col("event_id"),
      get_json_object(col("props"), "$.k").cast("long").as("k"),
      get_json_object(col("props"), "$.a").cast("long").as("a"),
      get_json_object(col("props"), "$.b").as("b"),
      get_json_object(col("props"), "$.c").cast("double").as("c"),
      get_json_object(col("props"), "$.d").cast("long").as("d"))
    def mapForm(df: DataFrame): DataFrame = {
      val mapT = org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType,
        org.apache.spark.sql.types.StringType)
      df.select(col("event_id"), from_json(col("props"), mapT).as("m"))
        .select(col("event_id"),
          element_at(col("m"), "k").cast("long").as("k"),
          element_at(col("m"), "a").cast("long").as("a"),
          element_at(col("m"), "b").as("b"),
          element_at(col("m"), "c").cast("double").as("c"),
          element_at(col("m"), "d").cast("long").as("d"))
    }
    def structForm(df: DataFrame): DataFrame = {
      df.select(col("event_id"), from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL(
            "k LONG, a LONG, b STRING, c DOUBLE, d LONG")).as("s"))
        .select(col("event_id"), col("s.k"), col("s.a"), col("s.b"),
          col("s.c"), col("s.d"))
    }
    def variantForm(df: DataFrame): DataFrame =
      df.select(col("event_id"), parse_json(col("props")).as("v"))
        .select(col("event_id"),
          variant_get(col("v"), "$.k", "long").as("k"),
          variant_get(col("v"), "$.a", "long").as("a"),
          variant_get(col("v"), "$.b", "string").as("b"),
          variant_get(col("v"), "$.c", "double").as("c"),
          variant_get(col("v"), "$.d", "long").as("d"))

    def med(form: DataFrame => DataFrame): Double =
      (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        form(src).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted.apply(reps / 2)

    // cross-check: all four forms agree on the SAME row before timing —
    // pinned by key, not limit(1) (four independent limit(1) scans have
    // no shared row-selection guarantee and could assert spuriously)
    val probeId = src.agg(min(col("event_id"))).head().getLong(0)
    val one = src.filter(col("event_id") === probeId)
    val probeRow = gjo(one).collect().head
    Seq(mapForm _, structForm _, variantForm _).foreach { f =>
      assert(f(one).collect().head.toString == probeRow.toString,
        "extraction forms disagree — probe would time different work")
    }
    val (tG, tM, tS, tV) = (med(gjo), med(mapForm), med(structForm),
      med(variantForm))
    println(f"""{"probe":"variant_multifield","rows":$n,"fields":5,"gjo_x5_s":$tG%.3f,"map_once_s":$tM%.3f,"struct_once_s":$tS%.3f,"variant_once_s":$tV%.3f}""")
    spark.stop()
  }
}
