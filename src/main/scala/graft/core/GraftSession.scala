package graft.core

import org.apache.spark.sql.SparkSession

/** Session bootstrap — the analog of the reference's
  * `StreamExecutionEnvironment.getExecutionEnvironment()`
  * (ref: DataStreamJob.java:9-11, WindowWordCount.java:16).
  *
  * Scale notes (100 TB target):
  *  - AQE on: runtime shuffle-partition coalescing + skew-join splitting
  *    replace hand-tuned parallelism (the reference hardcodes parallelism 2,
  *    docker-compose.yml:55).
  *  - shuffle.partitions sized to the local core count for tests; on a real
  *    cluster this is executors*cores*2-3 and AQE coalesces down.
  *  - UTC session timezone so timestamp arithmetic matches the oracle.
  */
object GraftSession {
  def local(cores: Int = 32): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
