package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

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

  /** Small-files compactor: rewrite an existing parquet directory into
    * `ceil(bytes / targetBytes)` files. THE 100 TB ops primitive the
    * streaming sinks and fine-grained ingests need — a micro-batch
    * writer or a 10k-task job leaves thousands of KB-sized files, and
    * every later scan pays one task + one open per file (plus the
    * object-store listing). Input bytes come from the filesystem (exact
    * — this is re-laying out EXISTING data, no estimation involved);
    * the rewrite goes through [[graft.core.IndexStore.replace]], so the
    * directory stays readable for the whole rewrite and a crash can
    * never leave it torn or empty. Returns the file count written.
    *
    * Direction asymmetry, deliberate: GLUING (the compaction case —
    * target count below the read's split count) uses `coalesce`, which
    * pays no shuffle and preserves any within-file ordering per output
    * file; SPLITTING oversized files (target above the split count)
    * needs `repartition`'s round-robin shuffle, because a parquet file
    * only splits at row-group boundaries the reader chooses — the rare
    * direction, and the shuffle is the data being rewritten anyway.
    *
    * Scope: FLAT directories (one parquet dataset, no partitionBy
    * subdirectories) — a Hive-partitioned root is rejected loudly,
    * because it would read back with the partition columns folded into
    * the data files, silently changing the layout. Compact each leaf
    * partition directory instead (the per-partition call is also what
    * a 100 TB compaction scheduler does: partitions compact
    * independently, on independent cadences). */
  def compactParquetDir(spark: SparkSession, path: String,
                        targetBytes: Long = 128L << 20): Int = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val partDirs = fs.listStatus(p).filter(_.isDirectory)
      .map(_.getPath.getName).filter(_.contains("="))
    require(partDirs.isEmpty,
      s"$path is a partitioned root (found ${partDirs.headOption.getOrElse("")}/) — " +
        "compact each leaf partition directory instead")
    val bytes = fs.getContentSummary(p).getLength
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    graft.core.IndexStore.replace(spark, path) { scratch =>
      val in = spark.read.parquet(path)
      val sized =
        if (nFiles <= in.rdd.getNumPartitions) in.coalesce(nFiles)
        else in.repartition(nFiles)
      sized.write.mode("overwrite").parquet(scratch)
    }
    nFiles
  }
}
