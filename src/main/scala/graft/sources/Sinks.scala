package graft.sources

import org.apache.spark.sql.DataFrame

/** Batch sink helpers (the write side of the engine).
  *
  * Scale notes: partition by LOW-cardinality columns only (lang, date) —
  * a high-cardinality partitionBy creates millions of directories;
  * bucketBy is the tool for high-cardinality join keys (shuffle-free
  * joins on read). `maxRecordsPerFile` bounds file sizes so downstream
  * scans parallelize evenly.
  */
object Sinks {

  /** Write parquet partitioned by the given columns. */
  def parquetPartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                         maxRecordsPerFile: Long = 5000000): Unit =
    df.write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .mode("overwrite")
      .parquet(path)

  /** Write a bucketed table (requires a table catalog name, not a bare
    * path): co-locates rows by key so later joins on `bucketCols` skip
    * the shuffle entirely. */
  def parquetBucketed(df: DataFrame, table: String, buckets: Int,
                      bucketCols: Seq[String]): Unit =
    df.write
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)
}
