package graft.ext

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Df-cap skew guard for bucket-keyed candidate self-joins (MinHash
  * bands, SimHash bit-bands, hyperplane-LSH buckets, IVF cells).
  *
  * The failure mode it exists for: candidate generation costs
  * O(Σ bucket²), and on a NATURAL corpus one boilerplate shingle /
  * template page / degenerate embedding can put a corpus-sized
  * posting list into a single (band, hash) bucket — the whole join
  * lands on one reducer and the quadratic term swallows the job. The
  * synthetic fixtures never manufacture this; production corpora do.
  *
  * The guard DROPS buckets whose occupancy exceeds `maxBucket` before
  * the self-join, which bounds per-task join input by construction.
  *
  * Output contract (documented recall effect): a candidate pair
  * survives iff it collides in at least one bucket of occupancy <=
  * maxBucket. Pairs whose every collision is inside a hot bucket are
  * lost — deliberately: a bucket with occupancy ≫ expected cluster
  * size no longer carries similarity signal (under a uniform hash,
  * occupancy tracks true duplicate-cluster size; a corpus-sized bucket
  * means the FEATURE is degenerate, e.g. a boilerplate shingle shared
  * by everything, and its O(m²) candidates are almost all false). This
  * is the standard production guard (df-capped posting lists in
  * AllPairs/PPJoin implementations, `max_df` in sklearn's vectorizers).
  * Set the cap well above the expected duplicate-cluster size; 0
  * disables the guard (the default everywhere, and what every
  * oracle-checked query uses).
  *
  * Audit channel: the capped frame carries an `observe` metric
  * (`graft_skew_guard_*`: buckets_dropped / rows_dropped) that
  * piggybacks on the occupancy aggregate — visible to any
  * QueryExecutionListener and in the SQL UI, costing nothing extra —
  * and [[hotBuckets]] is the standalone diagnostic for "what would a
  * cap of N drop". */
object SkewGuard {

  private val guardSeq = new AtomicLong(0)

  /** `rows` filtered to buckets (grouped by `keys`) with occupancy <=
    * `maxBucket`; `maxBucket <= 0` returns `rows` unchanged. One extra
    * aggregation + equi-join on the same keys the downstream candidate
    * join shuffles on — only paid when the guard is active. */
  def capBuckets(rows: DataFrame, keys: Seq[String], maxBucket: Int): DataFrame =
    if (maxBucket <= 0) rows
    else {
      val keyCols = keys.map(col)
      val name = s"graft_skew_guard_${guardSeq.incrementAndGet()}"
      val cool = rows.groupBy(keyCols: _*).agg(count(lit(1)).as("__bucket_n"))
        .observe(name,
          sum(when(col("__bucket_n") > maxBucket, 1L).otherwise(0L))
            .as("buckets_dropped"),
          sum(when(col("__bucket_n") > maxBucket, col("__bucket_n"))
            .otherwise(0L)).as("rows_dropped"))
        .filter(col("__bucket_n") <= maxBucket)
        .select(keyCols: _*)
      rows.join(cool, keys)
    }

  /** Diagnostic: the buckets a cap of `maxBucket` would drop, with
    * their occupancy — the audit a corpus team runs before picking the
    * cap (the occupancy histogram's tail IS the boilerplate report). */
  def hotBuckets(rows: DataFrame, keys: Seq[String], maxBucket: Int): DataFrame =
    rows.groupBy(keys.map(col): _*).agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") > maxBucket)
}
