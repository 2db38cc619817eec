package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Helpers that make query outputs hash-identical between Spark and the
  * DuckDB oracle, independent of execution/accumulation order.
  *
  *  - Double sums are order-dependent in the last bits, and Spark/DuckDB
  *    aggregate in different orders. So: cast each double to an exact
  *    DECIMAL first (a double never falls on a decimal half-ulp boundary,
  *    so Spark's and DuckDB's cast round identically), aggregate the
  *    decimals exactly (order-independent), and cast the final value back
  *    to double (IEEE nearest — deterministic).
  *  - Timestamps are emitted as epoch microseconds (BIGINT) to dodge
  *    parquet tz-annotation differences between writers.
  *  - Integer outputs are standardized to BIGINT on both sides.
  */
object Oracle {
  /** Exact, order-independent sum of a double column. SQL analog:
    * `CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE)`. */
  def dsum(c: Column): Column =
    sum(c.cast("decimal(18,6)")).cast("double")

  /** Exact sum of a product of two double columns (e.g. revenue =
    * extendedprice * (1 - discount)). Each factor is snapped to
    * DECIMAL(18,6); the product is exact DECIMAL arithmetic. The scale-12
    * sum is reduced to scale 6 before the double cast: DuckDB's
    * int128->double conversion is not correctly rounded at scale 12, but
    * at scale 6 the scaled integer fits in 2^53 and both engines convert
    * exactly. */
  def dsumProd(a: Column, b: Column): Column =
    round(sum(a.cast("decimal(18,6)") * b.cast("decimal(18,6)")), 6)
      .cast("double")

  /** Order-independent average: exact decimal sum -> double, / count. */
  def davg(c: Column): Column =
    sum(c.cast("decimal(18,6)")).cast("double") / count(lit(1))

  /** Epoch microseconds of a timestamp column, as BIGINT. */
  def epochUs(c: Column): Column = unix_micros(c)

  // SQL-side helper snippets (DuckDB dialect), kept adjacent for review:
  //   dsum(x)      -> CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE)
  //   dsumProd     -> CAST(SUM(CAST(a AS DECIMAL(18,6)) * CAST(b AS DECIMAL(18,6))) AS DOUBLE)
  //   davg(x)      -> CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
  //   epochUs(ts)  -> epoch_us(ts)
  def sqlDsum(x: String): String =
    s"CAST(SUM(CAST($x AS DECIMAL(18,6))) AS DOUBLE)"
  def sqlDsumProd(a: String, b: String): String =
    s"CAST(round(SUM(CAST($a AS DECIMAL(18,6)) * CAST($b AS DECIMAL(18,6))), 6) AS DOUBLE)"
  def sqlDavg(x: String): String =
    s"CAST(SUM(CAST($x AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)"
}
