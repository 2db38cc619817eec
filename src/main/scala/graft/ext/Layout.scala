package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data layout for scan pruning — the file-skipping tier.
  *
  * At 100 TB the dominant cost of a selective query is the SCAN, and
  * after partition pruning the remaining lever is parquet row-group
  * min/max statistics: the reader skips any row group whose [min,max]
  * interval excludes the pushed predicate. An unsorted table defeats
  * this completely — round-robin placement puts every key range in
  * every row group, so each row group's stats span the whole domain
  * and nothing is ever skipped. CLUSTERING the data at write time is
  * what turns footer stats into an index:
  *
  *  - [[rangeLayout]]: global range-cluster on one (or a prefix of)
  *    column(s) — `repartitionByRange` + `sortWithinPartitions`.
  *    A predicate on the leading column then reads ~selectivity
  *    fraction of row groups. The right shape when one column
  *    dominates the workload's predicates (time, usually).
  *  - [[zorderLayout]]: two-dimensional interleaved layout. Each
  *    column is first mapped to an equi-depth cell index (0..cells-1,
  *    boundaries from an approximate-quantile sketch pass), and rows
  *    are range-clustered on the bit-interleave (Morton / Z-value) of
  *    the two cell indices. Every row group then covers a small
  *    RECTANGLE of the (c1, c2) value space, so its footer carries
  *    narrow min/max for BOTH columns and predicates on EITHER (or
  *    both) prune — where a single-column sort gives pruning on the
  *    leading column only and none on the second. Equi-depth cells
  *    (not equi-width) keep the layout balanced under skewed value
  *    distributions — each cell holds ~1/cells of the rows by
  *    construction.
  *
  * Scale shape: the layout write is one range exchange of the corpus
  * (the same cost class as any bucketed/sorted write — paid once,
  * amortized over every subsequent selective read); the quantile pass
  * for Z-ordering is a sketch aggregation collecting (cells-1)
  * doubles per dimension to the driver (bounded: 255 values at the
  * 256-cell default, NOT corpus-scaled). Cell indexing costs
  * O(cells) comparisons per row inside codegen; at 256 cells this is
  * noise against the exchange it feeds. Nothing here is driver-sized
  * except the boundary arrays.
  *
  * Two parquet footnotes that each cost a first attempt its stats:
  *  - Spark's default `spark.sql.parquet.outputTimestampType` is
  *    INT96, and INT96 row groups carry NO usable min/max. The
  *    writers force TIMESTAMP_MICROS (INT64, full stats) for the
  *    duration of the write and restore the session value after.
  *  - TIMESTAMP_NTZ never prunes: Spark's parquet filter conversion
  *    declines NTZ predicates even though the plan's PushedFilters
  *    lists them (measured on a shipdate-clustered copy: 60,000 of
  *    60,000 records read with the NTZ column; 3,811 of 60,000 after
  *    casting it to TIMESTAMP). So clustering columns arriving as NTZ
  *    are normalized to TIMESTAMP at write — instant-preserving under
  *    the session's pinned UTC, and the one type this build's reader
  *    will actually row-group-filter.
  */
object Layout {

  /** Spread the low 8 bits of `c` so that bit i lands at bit 2i
    * (0b00000000abcdefgh -> 0b0a0b0c0d0e0f0g0h). Pure integer
    * Column math — stays inside whole-stage codegen. */
  private def spread8(c: Column): Column = {
    val x0 = c.bitwiseAND(lit(0xFF))
    val x1 = x0.bitwiseOR(shiftleft(x0, 4)).bitwiseAND(lit(0x0F0F))
    val x2 = x1.bitwiseOR(shiftleft(x1, 2)).bitwiseAND(lit(0x3333))
    x2.bitwiseOR(shiftleft(x2, 1)).bitwiseAND(lit(0x5555))
  }

  /** 16-bit Z-value (Morton code) of two 8-bit cell indices: `b1`
    * occupies the even bits, `b2` the odd bits. Adjacent Z-values
    * differ in few cells of either dimension — the locality that
    * makes a Z-sorted row group a rectangle in value space. */
  def zValue16(b1: Column, b2: Column): Column =
    spread8(b1).bitwiseOR(shiftleft(spread8(b2), 1))

  /** Equi-depth cell boundaries for `colName`: the (cells-1) inner
    * approximate quantiles, driver-collected (bounded by `cells`,
    * never by the corpus — 255 doubles at the default). Timestamps
    * and numerics are compared in double space (cast is monotone, so
    * cell order is value order). */
  def quantileBounds(df: DataFrame, colName: String, cells: Int): Array[Double] = {
    require(cells >= 2 && cells <= 256, s"cells must be in [2,256], got $cells")
    val probs = (1 until cells).map(_.toDouble / cells).toArray
    val c = df.schema(colName).dataType match {
      // NTZ has no direct double cast; route through TIMESTAMP (the
      // same normalization the writers apply — monotone either way)
      case org.apache.spark.sql.types.TimestampNTZType =>
        col(colName).cast("timestamp").cast("double")
      case _ => col(colName).cast("double")
    }
    df.select(c.as("v"))
      .where(col("v").isNotNull)
      .stat.approxQuantile("v", probs, 1e-3)
  }

  /** Cell index of `c` against sorted `bounds`: the count of
    * boundaries <= value (0..bounds.length). O(bounds) comparisons
    * per row via an array-literal HOF — codegen'd, and the lambda's
    * only free variable is the plain column ref (the round-3 lesson:
    * nothing expensive is re-evaluated per element). */
  def cellIdx(c: Column, bounds: Array[Double]): Column = {
    val arr = typedLit(bounds.toSeq)
    size(filter(arr, b => b <= c.cast("double")))
  }

  /** Range-cluster `df` on `sortCols` into `files` parquet files at
    * `path` (committed via [[graft.core.IndexStore.ensure]] — build
    * once per path, torn builds invisible). One range exchange +
    * per-file sort; row-group stats on the leading column become a
    * coarse index for free. */
  def rangeLayout(df: DataFrame, sortCols: Seq[String], path: String,
                  files: Int): String = {
    val spark = df.sparkSession
    val d = normalizeNtz(df, sortCols)
    graft.core.IndexStore.ensure(spark, path) { scratch =>
      withMicrosTimestamps(spark) {
        d.repartitionByRange(files, sortCols.map(col): _*)
          .sortWithinPartitions(sortCols.map(col): _*)
          .write.mode("overwrite").parquet(scratch)
      }
    }
  }

  /** Z-order `df` on `(c1, c2)` into `files` parquet files at `path`.
    * Equi-depth cells (default 256 per dimension → 16-bit Z-value),
    * range exchange on the Z-value, per-file sort, Z column dropped
    * before the write (the layout is carried by ROW ORDER and footer
    * stats, not by a stored column). */
  def zorderLayout(df: DataFrame, c1: String, c2: String, path: String,
                   files: Int, cells: Int = 256): String = {
    val spark = df.sparkSession
    val d = normalizeNtz(df, Seq(c1, c2))
    graft.core.IndexStore.ensure(spark, path) { scratch =>
      // ONE sketch pass for both dimensions (approxQuantile takes a
      // column array) — a per-column call would scan the corpus twice
      // before the range exchange
      val probs = (1 until cells).map(_.toDouble / cells).toArray
      val Array(b1, b2) = d
        .select(col(c1).cast("double").as("v1"),
                col(c2).cast("double").as("v2"))
        .na.drop()
        .stat.approxQuantile(Array("v1", "v2"), probs, 1e-3)
      val z = zValue16(cellIdx(col(c1), b1), cellIdx(col(c2), b2))
      withMicrosTimestamps(spark) {
        d.withColumn("_graft_z", z)
          .repartitionByRange(files, col("_graft_z"))
          .sortWithinPartitions(col("_graft_z"))
          .drop("_graft_z")
          .write.mode("overwrite").parquet(scratch)
      }
    }
  }

  /** Clustering columns arriving as TIMESTAMP_NTZ become TIMESTAMP
    * (see the class doc's measured finding: the reader never builds a
    * parquet row-group filter for NTZ, so an NTZ-clustered layout
    * prunes nothing). Instant-preserving under the UTC session. */
  private def normalizeNtz(df: DataFrame, cols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types.TimestampNTZType
    cols.foldLeft(df) { (d, c) =>
      if (d.schema(c).dataType == TimestampNTZType)
        d.withColumn(c, col(c).cast("timestamp"))
      else d
    }
  }

  /** Run `body` with parquet timestamps written as TIMESTAMP_MICROS
    * (INT64 — carries min/max stats; the INT96 default does not),
    * restoring the previous session value after. Serialized across
    * threads of a session: two concurrent builds interleaving
    * set/restore could strand the session on the temporary value or
    * hand one build the stats-free INT96 default mid-write —
    * timing-dependent versions of exactly the failure this guard
    * exists to prevent. (Cross-SESSION builds are unaffected: the
    * conf is per-session.) */
  private val tsConfLock = new Object
  private def withMicrosTimestamps[T](spark: SparkSession)(body: => T): T =
    tsConfLock.synchronized {
      val key = "spark.sql.parquet.outputTimestampType"
      val prev = spark.conf.getOption(key)
      spark.conf.set(key, "TIMESTAMP_MICROS")
      try body
      finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
}
