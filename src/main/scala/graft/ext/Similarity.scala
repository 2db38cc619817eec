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

  /** Snap a whole float array once — project this to a column before
    * pairwise work so each vector snaps once, not once per pair.
    * Native codegen loop (SnapVecLong scaladoc: the transform HOF
    * interpreted its lambda per component, dims × corpus times at the
    * head of every y-tier build). */
  def snapVec(c: Column): Column = graft.functions.SnapVecLong.snap_vec(c)

  /** Exact int64 dot product of two pre-snapped (long-array) columns —
    * a native codegen Expression (see DotProductLong: HOF lambdas are
    * interpreted per element and were the pairwise-scan bottleneck). */
  def dotLong(a: Column, b: Column): Column =
    graft.functions.DotProductLong.dot_long(a, b)

  /** Euclidean norm of a pre-snapped vector (exact int64 sum -> IEEE
    * sqrt) — project per vector, never per pair. */
  def normSnapped(sv: Column): Column = sqrt(dotLong(sv, sv).cast("double"))

  /** Cosine from pre-snapped vectors and precomputed norms. */
  def cosineFromSnapped(sva: Column, svb: Column, na: Column, nb: Column): Column =
    dotLong(sva, svb).cast("double") / (na * nb)

  /** Exact int64 dot product of two (snapped) float arrays. */
  def dotSnapped(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => snap(x) * snap(y)),
      lit(0L),
      (acc, x) => acc + x)

  /** Deterministic (quantized) cosine similarity of two float-array
    * columns — every step exact or IEEE-defined. Convenience form; the
    * hot path should use snapVec/normSnapped/cosineFromSnapped. */
  def cosine(a: Column, b: Column): Column =
    dotSnapped(a, b).cast("double") /
      (sqrt(dotSnapped(a, a).cast("double")) * sqrt(dotSnapped(b, b).cast("double")))

  // ---- random-hyperplane LSH ----

  /** Dialect-portable SQL for the same weight, with `i` the 1-based dim
    * (for the DuckDB oracle). */
  def weightSqlFor(j: Int): String =
    "(" + Dedup.hex4ValSql(s"substr(md5('${j}_' || CAST(i AS VARCHAR)), 1, 4)") +
      " % 2001 - 1000)"

  /** Driver-side weight table for plane j over `dims` dimensions — the
    * exact same md5-derived values weightSqlFor(j) computes in SQL,
    * materialized once as a literal array so executors do zero hashing. */
  def planeWeights(j: Int, dims: Int): Array[Long] = {
    val mdi = java.security.MessageDigest.getInstance("MD5")
    (1 to dims).map { i =>
      val hex = mdi.digest(s"${j}_$i".getBytes("UTF-8"))
        .take(2).map(b => f"${b & 0xff}%02x").mkString
      val v = java.lang.Long.parseLong(hex, 16)
      (v % 2001) - 1000
    }.toArray
  }

  /** Sign bit of hyperplane j's projection of a pre-snapped vector:
    * exact int64 dot with the literal weight array — no float boundary,
    * no runtime hashing. */
  def planeBit(sv: Column, j: Int, dims: Int): Column = {
    val w = typedLit(planeWeights(j, dims))
    when(dotLong(sv, w) > 0, lit(1)).otherwise(lit(0))
  }

  /** LSH bucket id from `nPlanes` hyperplane sign bits over a
    * pre-snapped vector column.
    *
    * Sizing rule (the same law as the simhash band width,
    * Dedup.simhashBits): candidate joins on the bucket id cost
    * O(Σ bucket²), so bucket occupancy must track CLUSTER sizes, not
    * corpus size — pick nPlanes with 2^nPlanes ≫ n / target_bucket_size,
    * i.e. grow nPlanes logarithmically with the corpus (8 planes / 256
    * buckets saturates around 10⁴–10⁵ vectors; a 10⁹-vector corpus wants
    * ~24–30 planes, recall recovered via multi-probe or band OR-ing).
    * Buckets NEST across plane counts — bucket_k = bucket_m mod 2^k for
    * k < m, because plane j's weights depend only on j — so raising
    * nPlanes strictly refines the partition (spec-asserted:
    * max-occupancy is non-increasing, same-bucket pair sets only
    * shrink). */
  def lshBucket(sv: Column, nPlanes: Int, dims: Int): Column =
    lshBucketBand(sv, 0, nPlanes, dims)

  /** Bucket id from band `band`'s planes — plane indices
    * [band*nPlanes, (band+1)*nPlanes), so bands draw DISJOINT,
    * independent hyperplane sets ([[lshBucket]] is band 0). OR-ing
    * candidates across bands is the recall knob that pairs with the
    * plane-count scale knob: high nPlanes keeps every band's buckets
    * small (the join stays linear), extra bands recover the true pairs
    * a single band's 1-in-2^planes collision probability would miss —
    * identical to MinHash banding's rows-per-band × bands trade-off
    * (and to Dedup.simhashBandPairs' pigeonhole rotation). */
  def lshBucketBand(sv: Column, band: Int, nPlanes: Int, dims: Int): Column =
    (0 until nPlanes).map(k =>
      planeBit(sv, band * nPlanes + k, dims) * lit(1 << k))
      .reduce(_ + _).cast("long")
}
