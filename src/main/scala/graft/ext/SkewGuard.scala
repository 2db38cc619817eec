package graft.ext

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{Column, DataFrame}
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
    * `maxBucket`; `maxBucket <= 0` returns `rows` unchanged. Cost when
    * armed: one aggregation (whose map-side combine reduces the shuffle
    * to (key, count) pairs) plus a broadcast ANTI-join against the HOT
    * key set — by the guard's own premise that set is tiny (a handful
    * of degenerate boilerplate keys), so the data rows themselves are
    * never reshuffled; the guard is a map-side filter. (The first
    * formulation equi-joined against the COOL set — nearly every key —
    * which reshuffled the full input twice; measured 3.5x the
    * unguarded d15 stage cost at sf0.1 before the flip.)
    *
    * Armed/unarmed behavioral difference, part of the contract: rows
    * with a NULL in any key column are dropped when the guard is armed
    * (explicit filter — an anti-join alone would pass them) but passed
    * through when it is off. Every in-repo caller feeds the capped
    * frame to a downstream candidate EQUI-join on the same keys —
    * which drops null-keyed rows itself — so pair output is
    * unaffected; a caller using the capped frame for anything else
    * must treat null-keyed rows as filtered. The `null_key_rows`
    * observe metric counts them so the difference is auditable, not
    * silent. */
  def capBuckets(rows: DataFrame, keys: Seq[String], maxBucket: Int): DataFrame =
    if (maxBucket <= 0) rows
    else {
      val keyCols = keys.map(col)
      val anyKeyNull = keyCols.map(_.isNull).reduce(_ || _)
      val name = s"graft_skew_guard_${guardSeq.incrementAndGet()}"
      val hot = rows.groupBy(keyCols: _*).agg(count(lit(1)).as("__bucket_n"))
        .observe(name,
          sum(when(col("__bucket_n") > maxBucket, 1L).otherwise(0L))
            .as("buckets_dropped"),
          sum(when(col("__bucket_n") > maxBucket, col("__bucket_n"))
            .otherwise(0L)).as("rows_dropped"),
          sum(when(anyKeyNull, col("__bucket_n")).otherwise(0L))
            .as("null_key_rows"))
        .filter(col("__bucket_n") > maxBucket)
        .select(keyCols: _*)
      rows.filter(keyCols.map(_.isNotNull).reduce(_ && _))
        .join(hot, keys, "left_anti")
    }

  /** Recall-PRESERVING hot-bucket handling for bucket-keyed candidate
    * SELF-joins — the production alternative to [[capBuckets]] when a
    * hot bucket is meaningful (a genuinely large duplicate cluster)
    * rather than degenerate boilerplate: instead of dropping the
    * bucket, salt-split its posting list into g = ceil(n / maxBucket)
    * bounded sub-buckets by a deterministic hash of the id, and join
    * the sub-bucket CROSS-PRODUCT keys, so every pair of the unguarded
    * self-join is still emitted while no join task reads more than
    * ~2·maxBucket build/probe rows for any one key.
    *
    * Coverage argument: ids a, b in the same bucket carry salts
    * p = salt(a), q = salt(b). The left emission tags each row with
    * sub-bucket keys (own salt, j) for j in own..g-1; the right with
    * (i, own salt) for i in 0..own. The pair therefore meets at key
    * (min(p,q), max(p,q)) in one orientation, and the
    * least/greatest + distinct normalization below makes orientation
    * irrelevant — output is EXACTLY the unguarded join's pair set
    * (spec-asserted, and the d3_neardup_salted registration shares the
    * unguarded d3 oracle verbatim). Cool buckets (n <= maxBucket) get
    * g = 1 and degenerate to the plain join with zero replication.
    *
    * Cost contract, the deliberate difference from [[capBuckets]]:
    * total pair OUTPUT is unchanged (a hot bucket still contributes
    * O(n²) candidate pairs — spread over g² bounded tasks instead of
    * one quadratic straggler), and rows in a hot bucket are replicated
    * ~(g+1)/2 times into the shuffle. Use this mode for hot-but-real
    * buckets; keep the df-cap for buckets so hot their feature carries
    * no similarity signal. Per-task bound is in expectation (hash
    * unevenness adds slack ~sqrt of the sub-bucket size); rows with a
    * NULL key never self-match in the unguarded join and are dropped
    * here by the occupancy equi-join — same null contract as
    * [[capBuckets]].
    *
    * Returns distinct (a_id, b_id) with a_id < b_id, ready for a
    * verify stage. */
  def saltedSelfJoinPairs(rows: DataFrame, keys: Seq[String], idCol: String,
                          maxBucket: Int): DataFrame = {
    require(maxBucket > 0, "saltedSelfJoinPairs needs maxBucket > 0 " +
      "(use the plain self-join when no guard is wanted)")
    val keyCols = keys.map(col)
    val name = s"graft_skew_salt_${guardSeq.incrementAndGet()}"
    val occ = rows.groupBy(keyCols: _*).agg(count(lit(1)).as("__bucket_n"))
      .observe(name,
        sum(when(col("__bucket_n") > maxBucket, 1L).otherwise(0L))
          .as("buckets_split"),
        max(col("__bucket_n")).as("max_bucket_n"))
    // g = ceil(n / maxBucket); floor-of-double-division is exact far past
    // any real bucket size (n < 2^52)
    val withG = rows.join(occ, keys)
      .withColumn("__g",
        floor((col("__bucket_n") + lit(maxBucket - 1)) / lit(maxBucket))
          .cast("long"))
      .withColumn("__salt", pmod(hash(col(idCol)), col("__g")))
    val left = withG.select(
      keyCols :+ col(idCol).as("__l_id") :+ col("__salt").as("__i") :+
        explode(sequence(col("__salt"), col("__g") - 1)).as("__j"): _*)
    val right = withG.select(
      keys.map(k => col(k).as(s"r_$k")) :+ col(idCol).as("__r_id") :+
        col("__salt").as("__rj") :+
        explode(sequence(lit(0L), col("__salt"))).as("__ri"): _*)
    val joinCond = keys.map(k => col(k) === col(s"r_$k"))
      .reduce(_ && _) && col("__i") === col("__ri") && col("__j") === col("__rj") &&
      col("__l_id") =!= col("__r_id")
    left.join(right, joinCond)
      .select(least(col("__l_id"), col("__r_id")).as("a_id"),
        greatest(col("__l_id"), col("__r_id")).as("b_id"))
      .distinct()
  }

  /** Recall-preserving hot-bucket handling for bucket-keyed candidate
    * CROSS joins between two DISTINCT sides (a new batch's bands vs a
    * committed index's posting lists — [[Dedup.incrementalNeardup]],
    * [[Curation.incrementalLabels]]) — the cross-join analog of
    * [[saltedSelfJoinPairs]]. Because the sides are distinct there is
    * no orientation to normalize, and the construction is the plain 2-D
    * grid: each bucket splits into gL × gR cells (gS = ceil(nS /
    * maxBucket) from each side's own occupancy), a left row lands in
    * row saltL = hash(id) mod gL and replicates across all gR columns,
    * a right row lands in column saltR and replicates across all gL
    * rows — so the pair (a, b) meets at exactly the one cell
    * (saltL(a), saltR(b)), and the output is EXACTLY the unguarded
    * cross join's pair set (spec-asserted; the d9_incremental_salted
    * registration shares the unguarded d9 oracle verbatim).
    *
    * Cost contract: per-task input is bounded at ~2·maxBucket rows per
    * cell key (in expectation; hash unevenness adds ~sqrt slack); total
    * shuffle volume per hot bucket is nL·gR + nR·gL ≈ 2·nL·nR /
    * maxBucket — proportional to the bucket's pair count over the cap,
    * the price of keeping every pair. Buckets present on only one side
    * are dropped by the occupancy inner join (they contribute no
    * pairs); rows with a NULL key never match in the unguarded
    * equi-join and are dropped here the same way — both identical to
    * the unguarded screen's semantics. Use [[capBuckets]] (or a
    * write-time cap) instead when a hot bucket is degenerate
    * boilerplate rather than a genuinely large standing cluster.
    *
    * Returns distinct (leftIdCol, rightIdCol) — multi-band collisions
    * already collapsed, ready for a verify stage. */
  def saltedCrossJoinPairs(left: DataFrame, right: DataFrame,
                           keys: Seq[String], leftIdCol: String,
                           rightIdCol: String, maxBucket: Int): DataFrame = {
    require(maxBucket > 0, "saltedCrossJoinPairs needs maxBucket > 0 " +
      "(use the plain equi-join when no guard is wanted)")
    val keyCols = keys.map(col)
    def subBuckets(n: Column) =
      floor((n + lit(maxBucket - 1)) / lit(maxBucket)).cast("long")
    val name = s"graft_skew_xsalt_${guardSeq.incrementAndGet()}"
    val occ = left.groupBy(keyCols: _*).agg(count(lit(1)).as("__ln"))
      .join(right.groupBy(keyCols: _*).agg(count(lit(1)).as("__rn")), keys)
      .observe(name,
        sum(when(col("__ln") > maxBucket || col("__rn") > maxBucket, 1L)
          .otherwise(0L)).as("buckets_split"),
        max(greatest(col("__ln"), col("__rn"))).as("max_bucket_n"))
      .select(keyCols :+ subBuckets(col("__ln")).as("__lg") :+
        subBuckets(col("__rn")).as("__rg"): _*)
    val l = left.join(occ, keys)
      .select(keyCols :+ col(leftIdCol).as("__l_id") :+
        pmod(hash(col(leftIdCol)), col("__lg")).as("__ls") :+
        explode(sequence(lit(0L), col("__rg") - 1)).as("__rs"): _*)
    val r = right.join(occ, keys)
      .select(keys.map(k => col(k).as(s"__r_$k")) :+
        col(rightIdCol).as("__r_id") :+
        explode(sequence(lit(0L), col("__lg") - 1)).as("__r_ls") :+
        pmod(hash(col(rightIdCol)), col("__rg")).as("__r_rs"): _*)
    val cond = keys.map(k => col(k) === col(s"__r_$k")).reduce(_ && _) &&
      col("__ls") === col("__r_ls") && col("__rs") === col("__r_rs")
    l.join(r, cond)
      .select(col("__l_id").as(leftIdCol), col("__r_id").as(rightIdCol))
      .distinct()
  }

  /** Diagnostic: the buckets a cap of `maxBucket` would drop, with
    * their occupancy — the audit a corpus team runs before picking the
    * cap (the occupancy histogram's tail IS the boilerplate report). */
  def hotBuckets(rows: DataFrame, keys: Seq[String], maxBucket: Int): DataFrame =
    rows.groupBy(keys.map(col): _*).agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") > maxBucket)
}
