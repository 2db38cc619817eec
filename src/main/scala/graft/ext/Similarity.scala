package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding similarity primitives over `array<float>` columns.
  *
  * Determinism design: components are snapped to integers with
  * `floor(v * 1e6 + 0.5)` — IEEE double multiply/add/floor are
  * bit-identical in every engine — and all dot products are exact int64
  * sums (64 dims x (1e6)^2 products ≈ 6e13 « 2^53, so even the double
  * conversions are exact). Cosine is then quantized-exact: identical
  * bits in Spark and any oracle engine, so top-k ranks and threshold
  * filters never flap. (Decimal casts are NOT portable: DuckDB
  * truncates scale-reducing decimal casts and its float->decimal
  * conversion rounds through double scaling — int snapping sidesteps
  * the whole class of mismatches.)
  *
  * Scale path: brute-force top-k broadcasts the probe set against a
  * partitioned corpus scan (no shuffle of the big side; per-probe top-k
  * carries k rows per partition). The LSH variant buckets vectors by
  * random-hyperplane signs so candidate generation becomes an equi-join
  * on the bucket id.
  */
object Similarity {

  /** Snap a float component to an integer at 1e-6 resolution. */
  private def snap(c: Column): Column =
    floor(c.cast("double") * lit(1000000.0) + lit(0.5)).cast("long")

  /** Exact int64 dot product of two (snapped) float arrays. */
  def dotSnapped(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => snap(x) * snap(y)),
      lit(0L),
      (acc, x) => acc + x)

  /** Deterministic (quantized) cosine similarity of two float-array
    * columns — every step exact or IEEE-defined. */
  def cosine(a: Column, b: Column): Column =
    dotSnapped(a, b).cast("double") /
      (sqrt(dotSnapped(a, a).cast("double")) * sqrt(dotSnapped(b, b).cast("double")))

  // ---- random-hyperplane LSH ----

  /** 0-based position of single-char column `c` in the hex alphabet. */
  private def hexDigit(c: Column): Column =
    call_function("instr", lit("0123456789abcdef"), c) - 1

  /** Integer value of the first 4 hex chars of `h`, shifted to
    * [-1000, 1000] — the deterministic "random" hyperplane weight.
    * Mirrors Dedup.hex4ValSql / weightSqlFor for the oracle. */
  private def hex4Weight(h: Column): Column = {
    val v = hexDigit(substring(h, 1, 1)) * 4096 +
      hexDigit(substring(h, 2, 1)) * 256 +
      hexDigit(substring(h, 3, 1)) * 16 +
      hexDigit(substring(h, 4, 1))
    (v % 2001) - 1000
  }

  /** Dialect-portable SQL for the same weight, with `i` the 1-based dim
    * (for the DuckDB oracle). */
  def weightSqlFor(j: Int): String =
    "(" + Dedup.hex4ValSql(s"substr(md5('${j}_' || CAST(i AS VARCHAR)), 1, 4)") +
      " % 2001 - 1000)"

  /** Sign bit of hyperplane j's projection of `vec`: exact int64 sum of
    * weight * snapped component — the sign has no float boundary. */
  def planeBit(vec: Column, j: Int): Column = {
    val proj = aggregate(
      zip_with(vec, sequence(lit(1), size(vec)), (x, i) => {
        val w = hex4Weight(substring(
          md5(concat(lit(s"${j}_"), i.cast("string"))), 1, 4))
        snap(x) * w.cast("long")
      }),
      lit(0L),
      (acc, x) => acc + x)
    when(proj > 0, lit(1)).otherwise(lit(0))
  }

  /** LSH bucket id from `nPlanes` hyperplane sign bits. */
  def lshBucket(vec: Column, nPlanes: Int = 8): Column =
    (0 until nPlanes).map(j => planeBit(vec, j) * lit(1 << j))
      .reduce(_ + _).cast("long")
}
