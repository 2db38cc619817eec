package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication primitives for 100 TB-scale corpora.
  *
  * Design: everything before the candidate-pair join is a pure per-row
  * projection (no shuffle, codegen'd):
  *   tokens -> word-3-gram shingles -> md5 -> 4 minhash chunks -> 2 bands.
  * LSH banding turns all-pairs O(n²) into an equi-join on (band_idx,
  * band_hash) — the only shuffle, keyed by band hash, with bucket sizes
  * ~ duplicate-cluster sizes. Exact-Jaccard verification then touches
  * only candidate pairs.
  *
  * Hashes are md5-derived (not Spark's murmur3) so signatures are
  * engine-independent — the DuckDB oracle reproduces them bit-for-bit.
  * One md5 per shingle is split into four 32-bit chunks, giving 4
  * independent minhashes for the price of one hash.
  */
object Dedup {

  /** Word n-gram shingles from a token array (default 3-grams).
    * Empty when the doc has fewer than 3 tokens. */
  def shingles3(tokens: Column): Column =
    when(size(tokens) >= 3,
      transform(sequence(lit(1), size(tokens) - 2), i =>
        concat_ws(" ", element_at(tokens, i), element_at(tokens, i + 1),
          element_at(tokens, i + 2))))
      .otherwise(array().cast("array<string>"))

  /** The k-th minhash chunk (k in 0..3): lexicographic min over the
    * doc's shingles of md5-hex[8k .. 8k+8). Pure projection. */
  def minhashChunk(shingleArr: Column, k: Int): Column =
    array_min(transform(shingleArr, s => substring(md5(s), 8 * k + 1, 8)))

  /** LSH band hash over two signature chunks. */
  def bandHash(sigA: Column, sigB: Column): Column = md5(concat(sigA, sigB))

  /** doc_id -> distinct-shingle array, via staged projections.
    * Staging matters: tokenize once, then shingle from the materialized
    * token array — inlining the split into the shingle lambda would
    * re-split the text for every element access (O(n²) per doc). */
  def shingleFrame(docs: DataFrame, textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame =
    // sorted so the per-pair verify can merge-count (SortedIntersectCount)
    // instead of hash-building per pair; one sort per doc, amortized over
    // every candidate pair the doc appears in. The minhash sigs are mins
    // over the shingle set, so element order never affects them.
    docs.select(col(idCol), split(col(textCol), "\\s+").as("__toks"))
      .select(col(idCol),
        sort_array(array_distinct(shingles3(col("__toks")))).as("sh"))

  /** doc_id -> (sig0..sig3, band0, band1) signature frame.
    * One md5 per shingle (hashed once, then sliced into 4 chunks). */
  def minhashSignatures(docs: DataFrame, textCol: String = "text",
                        idCol: String = "doc_id",
                        hashMode: String = "md5"): DataFrame =
    signaturesFromShingles(shingleFrame(docs, textCol, idCol), idCol, hashMode)

  /** Signature frame from an existing (idCol, sh) shingle frame — split
    * out so pipelines that also verify candidates (neardupPairs) compute
    * and persist the shingle arrays ONCE and feed both stages. `keep`
    * names input columns to carry through unchanged (e.g. `"sh"` when
    * building a persistent index that stores shingles beside bands).
    *
    * `hashMode` picks the minhash family:
    *  - `"md5"` (default): one md5 per shingle sliced into 4 chunks —
    *    the CROSS-ENGINE-DETERMINISTIC mode; every oracle-checked query
    *    uses it because DuckDB computes the identical md5.
    *  - `"xxh64"`: 4 salted xxhash64 minhashes (codegen-native 64-bit,
    *    no hex strings, no string sig/band columns in the shuffle) +
    *    native 64-bit band hashes — the production mode for a large
    *    corpus. Identical pipeline topology (same shingles, same band
    *    structure, same candidate join, same exact-Jaccard verify), so
    *    verified OUTPUT pairs depend on the hash only through LSH
    *    recall. Measured ~18% off the whole signature stage at
    *    sf1-equivalent (the stage is shingling-dominated; the hashing
    *    component itself shrinks much more, and the sig/band columns
    *    it emits are 8-byte longs instead of 16-char strings, which is
    *    what the band-join shuffle carries). Sig columns are BIGINT;
    *    there is no DuckDB counterpart, which is exactly why it is not
    *    the default. */
  def signaturesFromShingles(shingled: DataFrame,
                             idCol: String = "doc_id",
                             hashMode: String = "md5",
                             keep: Seq[String] = Nil): DataFrame = hashMode match {
    case "md5" =>
      val kept = keep.map(col)
      val hashed = shingled
        .select(col(idCol) +: kept :+ transform(col("sh"), s => md5(s)).as("hs"): _*)
      val withSig = hashed
        .select(col(idCol) +: kept ++: (0 to 3).map(k =>
          array_min(transform(col("hs"), h => substring(h, 8 * k + 1, 8))).as(s"sig$k")): _*)
      withSig
        .withColumn("band0", bandHash(col("sig0"), col("sig1")))
        .withColumn("band1", bandHash(col("sig2"), col("sig3")))
    case "xxh64" =>
      val withSig = shingled
        .select(col(idCol) +: keep.map(col) ++: (0 to 3).map(k =>
          array_min(transform(col("sh"), s => xxhash64(lit(k), s))).as(s"sig$k")): _*)
      // xxhash64 SKIPS null inputs (all-null args hash to the bare seed),
      // unlike md5(concat(...)) which propagates NULL — without the guard
      // every shingle-less doc (< 3 tokens) would collide into one band
      // bucket, an O(m^2) candidate explosion plus 0/0 Jaccards. NULL
      // bands drop out of the candidate equi-join, matching md5 mode.
      withSig
        .withColumn("band0", when(col("sig0").isNotNull && col("sig1").isNotNull,
          xxhash64(col("sig0"), col("sig1"))))
        .withColumn("band1", when(col("sig2").isNotNull && col("sig3").isNotNull,
          xxhash64(col("sig2"), col("sig3"))))
    case other => throw new IllegalArgumentException(
      s"hashMode must be md5 or xxh64, got $other")
  }

  /** Materialize one round of an iterative algorithm: persist its row
    * RDD and re-plan from it. Truncates logical-plan lineage like
    * `localCheckpoint` (one join per round would otherwise nest and
    * analysis cost grows exponentially with round count) but, unlike a
    * checkpoint, the superseded round can be unpersisted EAGERLY the
    * moment its successor is materialized. Shared by both
    * connected-components variants — the most delicate piece of the
    * iteration machinery lives in exactly one place. */
  private def materializeRound(df: DataFrame)
      : (DataFrame, org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]) = {
    val r = df.rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    (df.sparkSession.createDataFrame(r, df.schema), r)
  }

  /** Candidate pairs from band collisions: unpivot bands to rows, then
    * a single equi-join on (band_idx, band_hash).
    *
    * `maxBucket` > 0 arms the [[SkewGuard]]: band buckets above that
    * occupancy are dropped before the self-join (a natural corpus's
    * boilerplate can make one bucket corpus-sized, putting the whole
    * O(bucket²) join on one reducer). Recall contract and cap-sizing
    * guidance in [[SkewGuard.capBuckets]]; 0 (the default, used by
    * every oracle-checked query) is the unguarded exact-LSH behavior. */
  def candidatePairs(sigs: DataFrame, idCol: String = "doc_id",
                     maxBucket: Int = 0): DataFrame = {
    val bands = SkewGuard.capBuckets(
      sigs.select(col(idCol),
        posexplode(array(col("band0"), col("band1"))).as(Seq("band_idx", "band_hash"))),
      Seq("band_idx", "band_hash"), maxBucket)
    val a = bands.select(col(idCol).as("a_id"), col("band_idx"), col("band_hash"))
    val b = bands.select(col(idCol).as("b_id"), col("band_idx").as("band_idx_b"),
      col("band_hash").as("band_hash_b"))
    a.join(b,
        col("band_idx") === col("band_idx_b") &&
        col("band_hash") === col("band_hash_b") &&
        col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id")).distinct()
  }

  /** The hottest band-bucket occupancy of a signature frame — one
    * exploded groupBy-count over (band_idx, band_hash) plus a 1-row
    * max, the cheap histogram [[refuseHotBuckets]] prices a pair
    * screen with. NULL bands (shingle-less docs, write-time-capped
    * index rows) are excluded, matching every candidate equi-join. */
  def maxBandOccupancy(sigs: DataFrame): Long = {
    val r = sigs.select(
        posexplode(array(col("band0"), col("band1")))
          .as(Seq("band_idx", "band_hash")))
      .filter(col("band_hash").isNotNull)
      .groupBy(col("band_idx"), col("band_hash"))
      .agg(count(lit(1)).as("__n"))
      .agg(max(col("__n"))).head()
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  /** Pre-flight occupancy REFUSAL for the unguarded pair screens (r14
    * verdict #3): an unguarded [[candidatePairs]] self-join costs
    * O(occupancy²) rows per band bucket ON ONE REDUCER — the r14
    * zipf-decade measurement ran a 500k-doc boilerplate-heavy corpus
    * through exactly this shape and spilled 66 GB before being killed
    * at >25 min. This check prices the screen FIRST (one linear
    * histogram pass — the same cost class as the signature projection
    * the screen needs anyway) and fails loud with a pointer to the
    * armed recipe instead of letting the join die by spill. Callers
    * are the oracle-parity FIXTURE builders, where the corpus is
    * caller-chosen and unguarded exactness is the point; armed
    * pipelines (capBuckets / salted / write-time-capped index) bound
    * the bucket by construction and need no pre-flight.
    *
    * `threshold` sizing: a bucket at occupancy B contributes ~B²/2
    * candidate pairs to one task; 1000 (the default the fixture
    * builders read from `spark.graft.dedup.maxUnguardedBucket`) caps
    * that at ~500k pairs/task — bounded-minutes work — while every
    * sf testdata dir sits orders of magnitude below (sf0.1 max
    * occupancy is duplicate-family-sized, single digits). */
  def refuseHotBuckets(sigs: DataFrame, threshold: Int, what: String): Unit = {
    require(threshold > 0, s"threshold must be > 0, got $threshold")
    refuse(maxBandOccupancy(sigs), threshold, what)
  }

  /** The PARAMETERIZED form of the pre-flight refusal (r15 verdict #4):
    * the unguarded all-pairs-per-bucket shape is not minhash-specific —
    * the winnow fingerprint self-join buckets on the fingerprint hash
    * (BASELINE records its hottest zipf bucket at ~53k rows → ~1.4e9
    * pairs from ONE bucket), the simhash screen on its bit-bands, the
    * kNN-graph candidate join on LSH buckets. One linear groupBy-count
    * histogram over `keyCols` prices any of them before the join runs;
    * occupancy above `threshold` fails loud with the armed recipes.
    * Callers pass the frame the join's both sides actually read
    * (persisted where the screen persists it anyway, so the pass warms
    * the cache the join reuses rather than adding a corpus scan). */
  def refuseHotGroups(rows: DataFrame, keyCols: Seq[String], threshold: Int,
                      what: String): Unit = {
    require(threshold > 0, s"threshold must be > 0, got $threshold")
    val r = rows.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__n")).agg(max(col("__n"))).head()
    refuse(if (r.isNullAt(0)) 0L else r.getLong(0), threshold, what)
  }

  /** Loud-refusal parse of the shared occupancy-threshold conf — the
    * one copy of the key and its error shape (a malformed value names
    * the key to fix instead of a bare NumberFormatException). */
  def maxUnguardedBucket(spark: SparkSession): Int = {
    val key = "spark.graft.dedup.maxUnguardedBucket"
    val raw = spark.conf.get(key, "1000")
    try raw.toInt
    catch { case _: NumberFormatException =>
      throw new IllegalArgumentException(s"$key must be an integer, got '$raw'")
    }
  }

  /** The simhash band screen's own refusal threshold, default 10× the
    * generic key: its per-pair verify is ONE xor+popcount on two longs
    * (~ns) where the minhash/winnow screens intersect shingle or
    * k-gram sets (~µs per pair), so the same task-seconds budget
    * tolerates ~100× the pairs = 10× the occupancy. Needed in
    * practice, not just in theory: the sf0.1 corpus's hottest 16-bit
    * simhash band bucket holds 1639 docs (vocabulary-structure bias,
    * not boilerplate) and verifies in under a second — a shared
    * 1000-doc threshold would refuse a healthy registered query. The
    * zipf decade's identical-boilerplate buckets (100k+) still fire.
    * Override via `spark.graft.dedup.maxUnguardedSimhashBucket`. */
  def maxUnguardedSimhashBucket(spark: SparkSession): Int = {
    val key = "spark.graft.dedup.maxUnguardedSimhashBucket"
    spark.conf.getOption(key) match {
      case None => 10 * maxUnguardedBucket(spark)
      case Some(raw) =>
        try raw.toInt
        catch { case _: NumberFormatException =>
          throw new IllegalArgumentException(
            s"$key must be an integer, got '$raw'")
        }
    }
  }

  private def refuse(hot: Long, threshold: Int, what: String): Unit =
    if (hot > threshold) throw new IllegalStateException(
      s"$what: hottest bucket holds $hot rows (> $threshold) — the " +
        "unguarded pair screen would put O(occupancy^2) join rows on one " +
        "task (measured: 66 GB spill / DNF at the 500k-doc zipf decade). " +
        "Use the armed recipe instead: writeNeardupIndex(maxBucket) for a " +
        "write-time-capped index, candidatePairsSalted / " +
        "incrementalNeardup(skewMode=salt) for recall-preserving splits, " +
        "maxBucket > 0 on the banded screens (drop semantics), " +
        "or raise spark.graft.dedup.maxUnguardedBucket if the occupancy " +
        "is a genuinely acceptable task size (tools/ProbeZipfMerge is " +
        "the worked example)")

  /** [[candidatePairs]] with the recall-PRESERVING skew treatment:
    * hot band buckets are salt-split into bounded sub-buckets and
    * joined by sub-bucket cross-product
    * ([[SkewGuard.saltedSelfJoinPairs]]) instead of being dropped.
    * Output is EXACTLY the unguarded candidate set (the
    * d3_neardup_salted registration shares the unguarded d3 oracle
    * verbatim — cross-engine proof), with per-task join input bounded
    * by ~2·maxBucket rows; use when a hot bucket is a genuinely large
    * duplicate cluster rather than degenerate boilerplate (cost and
    * mode-choice contract at [[SkewGuard.saltedSelfJoinPairs]]). */
  def candidatePairsSalted(sigs: DataFrame, idCol: String = "doc_id",
                           maxBucket: Int = 1000): DataFrame =
    SkewGuard.saltedSelfJoinPairs(
      sigs.select(col(idCol),
        posexplode(array(col("band0"), col("band1"))).as(Seq("band_idx", "band_hash"))),
      Seq("band_idx", "band_hash"), idCol, maxBucket)

  /** Exact Jaccard (over distinct shingle sets) for given candidate
    * pairs; returns pairs with jaccard >= minJaccard.
    *
    * The candidate set is tiny relative to the corpus (that's the point
    * of LSH), so verification joins the per-doc shingle ARRAYS to the
    * pairs and intersects in place — no exploded-shingle self-join, no
    * broadcast of a shingle-row table. Cost: O(|candidates| x shingle
    * count), independent of corpus size. */
  def verifyJaccard(docs: DataFrame, pairs: DataFrame, minJaccard: Double,
                    textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    verifyJaccardOnShingles(shingleFrame(docs, textCol, idCol), pairs,
      minJaccard, idCol)

  /** verifyJaccard against a pre-computed (idCol, sh) shingle frame.
    * REQUIRES the `sh` arrays ascending-sorted with distinct non-null
    * elements, i.e. built by [[shingleFrame]] — the intersection count
    * is a sorted-merge (SortedIntersectCount) and silently undercounts
    * on unsorted input. A pair of two shingle-less docs scores
    * jaccard 0.0 (not 0/0, which would throw under ANSI). */
  def verifyJaccardOnShingles(sh: DataFrame, pairs: DataFrame,
                              minJaccard: Double,
                              idCol: String = "doc_id"): DataFrame =
    verifyJaccardAcross(sh, sh, pairs, minJaccard, "a_id", "b_id", idCol)

  /** [[verifyJaccardOnShingles]] generalized to DIFFERENT shingle frames
    * per pair side — the incremental shape, where the left side is a
    * fresh batch's shingle frame and the right side is the stored `sh`
    * column of a persisted index. Same preconditions on both frames. */
  def verifyJaccardAcross(shLeft: DataFrame, shRight: DataFrame,
                          pairs: DataFrame, minJaccard: Double,
                          leftCol: String, rightCol: String,
                          idCol: String = "doc_id"): DataFrame = {
    val union = col("n_a") + col("n_b") - col("n_common")
    verifyAcross(shLeft, shRight, pairs, leftCol, rightCol, idCol,
      scoreName = "jaccard", minScore = minJaccard,
      score = when(union > 0,
        col("n_common").cast("double") / union.cast("double")).otherwise(0.0))
  }

  /** Exact CONTAINMENT verify over the same LSH candidates: score =
    * |A∩B| / min(|A|, |B|) — the share of the SMALLER document's
    * shingles present in the other. Catches doc-inside-doc duplication
    * (quoted articles, concatenated dumps, boilerplate-wrapped copies)
    * that symmetric Jaccard misses: a 100-shingle doc fully embedded in
    * a 1000-shingle doc has containment 1.0 but Jaccard ~0.1. Recall
    * caveat, documented deliberately: candidates still come from
    * MinHash banding, whose collision probability tracks JACCARD — a
    * short doc buried in a much larger one may never band-collide, so
    * this is the "containment over LSH candidates" operator; full
    * asymmetric recall needs a prefix-filtered or suffix-array path. */
  def verifyContainmentOnShingles(sh: DataFrame, pairs: DataFrame,
                                  minContainment: Double,
                                  idCol: String = "doc_id"): DataFrame = {
    val denom = least(col("n_a"), col("n_b"))
    verifyAcross(sh, sh, pairs, "a_id", "b_id", idCol,
      scoreName = "containment", minScore = minContainment,
      score = when(denom > 0,
        col("n_common").cast("double") / denom.cast("double")).otherwise(0.0))
  }

  /** In-engine recall/precision audit of the MinHash-LSH candidate
    * stage — the measurement operator behind trusting [[candidatePairs]]
    * at scale. Before shipping a dedup run over 100 TB you need a NUMBER
    * for what the banding misses; this computes it inside the engine, on
    * the same shingle/signature code the production pipeline runs, so
    * the audited recall is the deployed recall, not a paper estimate.
    *
    * Ground truth is COMPLETE for the audited threshold, via PREFIX
    * FILTERING (the [[containmentJoin]] theorem, instantiated for
    * Jaccard): for J(A,B) ≥ t > 0 with S the smaller set, |A∩B| =
    * J·|A∪B| ≥ t·|S|, so under any fixed global shingle order S's
    * prefix of length |S| − ⌈t·|S|⌉ + 1 must contain a shingle of A∩B
    * (pigeonhole) — joining every doc's prefix against the FULL
    * inverted index therefore generates every qualifying pair (each is
    * found from its smaller side's prefix row; floor is used in place
    * of ⌈·⌉, which only lengthens the prefix). Exact-Jaccard
    * verification then filters the candidates to the truth set — the
    * VERIFIED set, and hence every output number, is identical to the
    * r15 form's "pairs sharing ≥ 1 shingle" screen (prefix length
    * degrades to the whole doc at t = 0, recovering that screen
    * exactly), but candidate cost is Σ_{s ∈ prefixes} df(s) instead of
    * Σ df(shingle)² (r16: 171.8 task-seconds → the d12 cost class at
    * sf0.1; the global order is ascending df, so prefixes are each
    * doc's RAREST shingles). LSH candidates come from the unmodified
    * production [[candidatePairs]]. One summary row:
    *   n_docs, n_true (truth pairs), n_candidates (LSH pairs),
    *   n_found (truth ∩ LSH — also exactly the d3 OUTPUT, since verify
    *   keeps candidates iff they qualify), recall = n_found / n_true,
    *   precision = n_found / n_candidates (the verify stage's hit rate,
    *   i.e. what fraction of verify work is productive).
    *
    * Scale contract: even prefix-filtered, the truth side touches full
    * posting lists, so the audit runs on a SAMPLED SLICE, never the raw
    * corpus (the d17 registration slices doc_id % 2 = 0; a 100 TB
    * corpus audits a ~1e-4 hash slice). A uniform doc slice estimates
    * pair recall without bias only when duplicate pairs are
    * exchangeable across the slice boundary — true for hash slicing;
    * band-stratified slicing would overestimate. Deterministic under
    * md5 mode, hence DuckDB-oracle-checkable end-to-end (the oracle
    * keeps the overlap-join formulation; equality of the verified sets
    * is exactly the completeness theorem, and the hashes check it
    * cross-engine every round). */
  def lshRecallAudit(docs: DataFrame, minJaccard: Double = 0.8,
                     idCol: String = "doc_id"): DataFrame = {
    val sh = graft.core.CacheScope.track(shingleFrame(docs, idCol = idCol).persist())
    // exploded rows feed the df aggregation, the prefix ranking AND the
    // inverted-index probe side — persist once (the containmentJoin
    // discipline)
    val ex = graft.core.CacheScope.track(
      sh.select(col(idCol), explode(col("sh")).as("__s")).persist())
    val dfreq = ex.groupBy(col("__s")).agg(count(lit(1)).as("__df"))
    val wPfx = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("__df"), col("__s"))
    val prefix = ex.join(dfreq, "__s")
      .withColumn("__rn", row_number().over(wPfx).cast("long"))
      .join(sh.select(col(idCol), size(col("sh")).cast("long").as("__pfx_n")),
        idCol)
      .filter(col("__rn") <=
        col("__pfx_n") - floor(lit(minJaccard) * col("__pfx_n")).cast("long") + 1L)
      .select(col(idCol).as("__p_id"), col("__s"))
    val overlap = prefix
      .join(ex.select(col(idCol).as("__e_id"), col("__s")), "__s")
      .filter(col("__p_id") =!= col("__e_id"))
      .select(least(col("__p_id"), col("__e_id")).as("a_id"),
        greatest(col("__p_id"), col("__e_id")).as("b_id"))
      .distinct()
    val truth = graft.core.CacheScope.track(
      verifyJaccardOnShingles(sh, overlap, minJaccard, idCol)
        .select(col("a_id"), col("b_id")).persist())
    // the signature frame feeds both sides of the candidate band join —
    // persisted like the d3 pipeline's (r16 plan audit)
    val sigs = graft.core.CacheScope.track(
      signaturesFromShingles(sh, idCol).persist())
    val cand = graft.core.CacheScope.track(
      candidatePairs(sigs, idCol).persist())
    val found = truth.join(cand, Seq("a_id", "b_id"))
    // four 1-row aggregates crossJoined (each side broadcast-sized by
    // construction), then the two ratios; divisions guarded to 1.0 on
    // empty denominators (an empty audit slice is a vacuous pass)
    sh.agg(count(lit(1)).as("n_docs"))
      .crossJoin(truth.agg(count(lit(1)).as("n_true")))
      .crossJoin(cand.agg(count(lit(1)).as("n_candidates")))
      .crossJoin(found.agg(count(lit(1)).as("n_found")))
      .withColumn("recall",
        when(col("n_true") > 0,
          col("n_found").cast("double") / col("n_true").cast("double"))
          .otherwise(1.0))
      .withColumn("precision",
        when(col("n_candidates") > 0,
          col("n_found").cast("double") / col("n_candidates").cast("double"))
          .otherwise(1.0))
  }

  /** COMPLETE-recall containment join via prefix filtering (the
    * AllPairs/PPJoin family) — the exact-asymmetric path that closes
    * [[verifyContainmentOnShingles]]'s documented LSH recall gap.
    *
    * Theorem (pigeonhole, under any fixed global shingle order): if
    * |A∩B| ≥ α, then any (|A| − α + 1)-subset of A contains an element
    * of A∩B. For containment |A∩B| / min(|A|,|B|) ≥ num/den, the
    * smaller side S of a qualifying pair satisfies |S∩L| ≥
    * ⌈num·|S|/den⌉, so S's prefix of length |S| − ⌈num·|S|/den⌉ + 1 in
    * the global order must contain a shingle of L. Joining every doc's
    * prefix against the FULL inverted index therefore generates every
    * qualifying pair (each is found from its smaller side's prefix) —
    * no false negatives, unlike MinHash banding.
    *
    * The global order is ascending corpus document-frequency (ties by
    * shingle string): prefixes are each doc's RAREST shingles, so the
    * candidate join touches only short posting lists — cost
    * Σ_{s ∈ prefixes} df(s), not Σ df². The prefix length is computed
    * in pure int64 (⌈num·n/den⌉ = (num·n + den − 1) div den) so both
    * engines agree exactly (0.9·n in doubles rounds unpredictably).
    *
    * Plan: explode once (persisted), one df aggregation, one join-back
    * + per-doc row_number window (shuffles on shingle then doc), the
    * inverted-index equi-join on shingle, exact verify on candidates.
    * Heavier than LSH banding — the price of completeness; at 100 TB
    * run it on the suspect slice (e.g. near-threshold d11 output or a
    * partition of interest), not the raw corpus. */
  def containmentJoin(sh: DataFrame, num: Int, den: Int,
                      idCol: String = "doc_id"): DataFrame = {
    require(num > 0 && den > 0 && num <= den, s"bad threshold $num/$den")
    val shP = graft.core.CacheScope.track(sh.persist())
    // exploded (doc, shingle) rows feed the df agg, the prefix ranking
    // AND the inverted-index probe side — persist once
    val ex = graft.core.CacheScope.track(
      shP.select(col(idCol), explode(col("sh")).as("s")).persist())
    val dfreq = ex.groupBy(col("s")).agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("df"), col("s"))
    // the doc-size column gets a reserved alias (__pfx_n) so the string-
    // SQL `div` below can never capture a caller column that happens to
    // be named `n` — expr() resolves by bare name, unlike the Column API
    // around it (integer `div` has no Column operator, and a double
    // divide-then-floor is not exact for all int64 inputs)
    val prefix = ex.join(dfreq, "s")
      .withColumn("rn", row_number().over(w).cast("long"))
      .join(shP.select(col(idCol), size(col("sh")).cast("long").as("__pfx_n")), idCol)
      .filter(col("rn") <=
        col("__pfx_n") - expr(s"(__pfx_n * $num + ${den - 1}) div $den") + 1L)
      .select(col(idCol).as("p_id"), col("s"))
    val cand = prefix
      .join(ex.select(col(idCol).as("e_id"), col("s")), "s")
      .filter(col("p_id") =!= col("e_id"))
      .select(least(col("p_id"), col("e_id")).as("a_id"),
        greatest(col("p_id"), col("e_id")).as("b_id"))
      .distinct()
    verifyContainmentOnShingles(shP, cand, num.toDouble / den, idCol)
  }

  /** Shared verify shape: join the per-side shingle arrays onto the
    * candidate pairs, sorted-merge-count the intersection in place, and
    * keep pairs whose `score` (an expression over n_common/n_a/n_b)
    * clears `minScore`. Cost O(|candidates| × shingle count) — never a
    * corpus-sized shuffle; both join build sides are the candidate set. */
  private def verifyAcross(shLeft: DataFrame, shRight: DataFrame,
                           pairs: DataFrame, leftCol: String, rightCol: String,
                           idCol: String, scoreName: String, minScore: Double,
                           score: => Column): DataFrame = {
    val sa = shLeft.select(col(idCol).as("said"), col("sh").as("sha"))
    val sb = shRight.select(col(idCol).as("sbid"), col("sh").as("shb"))
    pairs
      .join(sa, col("said") === col(leftCol))
      .join(sb, col("sbid") === col(rightCol))
      .withColumn("n_common", graft.functions.SortedIntersectCount
        .sorted_intersect_count(col("sha"), col("shb")))
      .withColumn("n_a", size(col("sha")).cast("long"))
      .withColumn("n_b", size(col("shb")).cast("long"))
      .select(col(leftCol), col(rightCol), col("n_common"), col("n_a"), col("n_b"),
        score.as(scoreName))
      .filter(col(scoreName) >= minScore)
  }

  // ---- incremental near-dup (batch vs persisted index) ----

  /** Write the persistent near-dup index for `docs`: one parquet table
    * (idCol, sh, sig0..sig3, band0, band1) — the d2 signature frame with
    * the sorted shingle arrays stored beside the bands, so a later batch
    * can both band-join AND exact-verify against the index without ever
    * re-tokenizing the corpus. At 100 TB this is the table a corpus team
    * maintains between ingests; it is append-friendly (pure per-row
    * projection, no cross-row state) and ~2 orders of magnitude smaller
    * than the corpus it summarizes (shingles are the dominant column;
    * partition by ingest date in production). */
  def writeNeardupIndex(docs: DataFrame, path: String,
                        textCol: String = "text",
                        idCol: String = "doc_id"): Unit =
    signaturesFromShingles(shingleFrame(docs, textCol, idCol), idCol,
        keep = Seq("sh"))
      .write.mode("overwrite").parquet(path)

  /** [[writeNeardupIndex]] with WRITE-TIME skew filtering: band values
    * whose posting list exceeds `maxBucket` are NULLed in the stored
    * index (the doc row and its `sh` stay — only the hot band entry is
    * suppressed, so the doc still screens via its other band and still
    * verifies exactly). A null band drops out of every consumer's
    * candidate equi-join, so screening a batch or stream against this
    * index with the guard OFF behaves exactly like screening the
    * uncapped index with `maxBucket` armed (differentially
    * spec-asserted) — WITHOUT the per-screen occupancy aggregation,
    * which for the streaming ingest path would otherwise re-run on the
    * full static index every micro-batch. This is the documented
    * production default for armed streaming use.
    *
    * Append caveat: occupancy is measured over THIS write's rows;
    * [[appendToNeardupIndex]] batches shift true occupancy, so a
    * pipeline appending heavily should re-cap during its periodic
    * index rewrite (the same cadence at which it folds survivors in). */
  def writeNeardupIndex(docs: DataFrame, path: String, textCol: String,
                        idCol: String, maxBucket: Int): Unit =
    if (maxBucket <= 0) writeNeardupIndex(docs, path, textCol, idCol)
    else {
      // the signature frame feeds two occupancy aggs and the final
      // projection — persist for the duration of the write
      val sigs = signaturesFromShingles(shingleFrame(docs, textCol, idCol),
        idCol, keep = Seq("sh")).persist()
      try {
        def hot(band: String) = sigs.filter(col(band).isNotNull)
          .groupBy(col(band)).agg(count(lit(1)).as("__n"))
          .filter(col("__n") > maxBucket)
          .select(col(band).as(s"__hot_$band"))
        sigs
          .join(hot("band0"), col("band0") === col("__hot_band0"), "left")
          .join(hot("band1"), col("band1") === col("__hot_band1"), "left")
          // when without otherwise: hot bands become NULL
          .withColumn("band0", when(col("__hot_band0").isNull, col("band0")))
          .withColumn("band1", when(col("__hot_band1").isNull, col("band1")))
          .drop("__hot_band0", "__hot_band1")
          .write.mode("overwrite").parquet(path)
      } finally sigs.unpersist()
    }

  /** Index maintenance: append a new batch's rows to an existing
    * near-dup index — the post-ingest step after [[incrementalNeardup]]
    * screens the batch (append the SURVIVORS, so tomorrow's batch
    * dedups against today's too). Pure per-row projection + parquet
    * append; no compaction needed because every index consumer is a
    * scan-side band/shingle read. */
  def appendToNeardupIndex(docs: DataFrame, path: String,
                           textCol: String = "text",
                           idCol: String = "doc_id"): Unit =
    signaturesFromShingles(shingleFrame(docs, textCol, idCol), idCol,
        keep = Seq("sh"))
      .write.mode("append").parquet(path)

  /** Index maintenance: the periodic REWRITE the write-time-cap caveat
    * calls for (see [[writeNeardupIndex]]'s append note — occupancy is
    * measured per write, so appended batches can push a band bucket past
    * the cap without any stored row saying so). Re-measures band
    * occupancy over the index's CURRENT rows — original write plus every
    * append, no re-tokenization, the index's own (band0, band1) columns
    * are the whole input — NULLs bands whose posting list now exceeds
    * `maxBucket`, and publishes atomically via [[graft.core.IndexStore.replace]]
    * (old index readable throughout the build; loud-fail gap only for
    * the swap instant; failed rebuild leaves the old index committed).
    *
    * Cap monotonicity, part of the contract: a band NULLed by an earlier
    * capped write stays NULL — its value is gone from the stored rows,
    * and un-suppressing it would need the corpus text. Compacting at a
    * LARGER cap therefore only restores nothing; to genuinely undo a
    * too-aggressive cap, rebuild from the corpus with
    * [[writeNeardupIndex]]. Run from one maintenance job at a time
    * (replace's single-maintainer contract), on the same cadence that
    * folds survivors in. */
  def compactNeardupIndex(spark: org.apache.spark.sql.SparkSession,
                          path: String, maxBucket: Int,
                          idCol: String = "doc_id"): Unit = {
    require(maxBucket > 0, "compactNeardupIndex needs maxBucket > 0 — " +
      "an uncapped compaction would be a no-op rewrite")
    val index = readNeardupIndex(spark, path)
    // the compaction itself operates purely on the band columns; idCol
    // is a schema check — compacting an artifact that is not a near-dup
    // index for this id column should fail before the rewrite starts
    require(Seq(idCol, "band0", "band1", "sh").forall(index.columns.contains),
      s"no ($idCol, band0, band1, sh) columns at $path — " +
        "not a writeNeardupIndex artifact for this id column")
    graft.core.IndexStore.replace(spark, path) { scratch =>
      def hot(band: String) = index.filter(col(band).isNotNull)
        .groupBy(col(band)).agg(count(lit(1)).as("__n"))
        .filter(col("__n") > maxBucket)
        .select(col(band).as(s"__hot_$band"))
      index
        .join(hot("band0"), col("band0") === col("__hot_band0"), "left")
        .join(hot("band1"), col("band1") === col("__hot_band1"), "left")
        // when without otherwise: hot bands become NULL
        .withColumn("band0", when(col("__hot_band0").isNull, col("band0")))
        .withColumn("band1", when(col("__hot_band1").isNull, col("band1")))
        .drop("__hot_band0", "__hot_band1")
        .write.mode("overwrite").parquet(scratch)
    }
  }

  /** Read a committed near-dup index written by [[writeNeardupIndex]] /
    * [[appendToNeardupIndex]] — the explicit read half of the index API.
    * The path is Hadoop-`FileSystem`-addressed (file:, hdfs://, s3a://);
    * an uncommitted or missing index fails loudly instead of returning
    * an empty scan. */
  def readNeardupIndex(spark: org.apache.spark.sql.SparkSession,
                       path: String): DataFrame =
    graft.core.IndexStore.read(spark, path,
      "near-dup index", "writeNeardupIndex")

  /** Near-dup pairs between a NEW batch and the indexed corpus — the
    * operational 100 TB dedup shape: "dedup today's ingest against
    * everything already indexed". Only the batch is shingled; the
    * corpus side comes entirely from the index parquet — its bands for
    * the candidate equi-join (column-pruned scan of (idCol, band0,
    * band1)), its stored `sh` arrays for the exact-Jaccard verify
    * (second pruned scan, touching only (idCol, sh)). Cost is
    * O(batch) + O(candidates) + two index scans, independent of the
    * corpus's tokenization cost. Output: (batch_id, corpus_id,
    * n_common, n_a, n_b, jaccard) at jaccard >= minJaccard.
    *
    * Skew dials, mirroring the self-join pipeline's two modes:
    * `maxBucket > 0` with `skewMode = "drop"` df-caps the INDEX's
    * posting lists (the corpus side is where a boilerplate bucket
    * lives; recall contract at [[SkewGuard.capBuckets]]); with
    * `skewMode = "salt"` it arms the recall-PRESERVING 2-D grid split
    * ([[SkewGuard.saltedCrossJoinPairs]]) over BOTH sides' bucket
    * occupancy — output equals the unguarded screen exactly, per-task
    * input bounded. Default 0 = exact, what the d9 registration uses. */
  def incrementalNeardup(spark: org.apache.spark.sql.SparkSession,
                         batch: DataFrame, indexPath: String,
                         minJaccard: Double,
                         textCol: String = "text",
                         idCol: String = "doc_id",
                         maxBucket: Int = 0,
                         skewMode: String = "drop"): DataFrame = {
    // the batch shingle frame feeds its signature stage AND the verify
    // join — persist it once (batch-sized, not corpus-sized)
    val bsh = graft.core.CacheScope.track(
      shingleFrame(batch, textCol, idCol).persist())
    incrementalNeardupOnShingles(spark, bsh, signaturesFromShingles(bsh, idCol),
      indexPath, minJaccard, idCol, maxBucket, skewMode)
  }

  /** The cross-screen core of [[incrementalNeardup]] over PRE-COMPUTED
    * batch shingle/signature frames — for callers that ALSO run the
    * batch-internal screen on the same batch (the streaming label
    * maintainer, the armed merge twins): one batch shingle + signature
    * projection feeds both screens instead of one per screen (r16 plan
    * audit: each such caller was paying the whole batch
    * tokenize→shingle→md5 pipeline twice per trigger). `bsh` must be a
    * [[shingleFrame]] output and `bSigs` its [[signaturesFromShingles]]
    * — callers persist whichever frames their composition reads more
    * than once. */
  def incrementalNeardupOnShingles(spark: org.apache.spark.sql.SparkSession,
                                   bsh: DataFrame, bSigs: DataFrame,
                                   indexPath: String,
                                   minJaccard: Double,
                                   idCol: String = "doc_id",
                                   maxBucket: Int = 0,
                                   skewMode: String = "drop"): DataFrame = {
    require(skewMode == "drop" || skewMode == "salt",
      s"skewMode must be drop or salt, got $skewMode")
    val index = readNeardupIndex(spark, indexPath)
    val bBands = bSigs
      .select(col(idCol).as("batch_id"),
        posexplode(array(col("band0"), col("band1")))
          .as(Seq("band_idx", "band_hash")))
    val cand =
      if (skewMode == "salt" && maxBucket > 0)
        SkewGuard.saltedCrossJoinPairs(
          bBands,
          index.select(col(idCol).as("corpus_id"),
            posexplode(array(col("band0"), col("band1")))
              .as(Seq("band_idx", "band_hash"))),
          Seq("band_idx", "band_hash"), "batch_id", "corpus_id", maxBucket)
      else {
        val iBands = SkewGuard.capBuckets(
          index.select(col(idCol).as("corpus_id"),
            posexplode(array(col("band0"), col("band1")))
              .as(Seq("band_idx_b", "band_hash_b"))),
          Seq("band_idx_b", "band_hash_b"), maxBucket)
        bBands.join(iBands,
            col("band_idx") === col("band_idx_b") &&
            col("band_hash") === col("band_hash_b"))
          .select(col("batch_id"), col("corpus_id")).distinct()
      }
    verifyJaccardAcross(bsh, index.select(col(idCol), col("sh")), cand,
      minJaccard, "batch_id", "corpus_id", idCol)
  }

  // ---- SimHash (16-bit, engine-portable) ----

  /** Dialect-portable SQL snippet: integer value of the first `nHex`
    * hex chars of string expr `h` (Spark SQL and DuckDB both support
    * instr/substr/md5). */
  def hexValSql(h: String, nHex: Int): String =
    (0 until nHex).map { k =>
      val mult = 1L << (4 * (nHex - 1 - k))
      // CAST the multiplier: this SQL runs on Spark AND DuckDB, and a
      // bare int-ranged literal would make digit*mult int arithmetic on
      // Spark, which overflows under ANSI once mult >= 2^28.
      s"(instr('0123456789abcdef', substr($h,${k + 1},1))-1)*CAST($mult AS BIGINT)"
    }.mkString("(", " + ", ")")

  /** 4-hex variant kept for the hyperplane weights. */
  def hex4ValSql(h: String): String = hexValSql(h, 4)

  /** SimHash bit width: 48 bits (12 md5 hex chars). Width is what makes
    * banded candidate generation scale: 3 bands of 16 bits give 65536
    * buckets per band, so bucket occupancy tracks true duplicate-cluster
    * sizes instead of corpus size (24-bit/8-bit-band banding saturates
    * its 256 buckets and the candidate join goes quadratic — measured
    * 17.5x time at 10x data before widening). At 100 TB the same
    * machinery widens to 64 bits / 4x16 (Manku et al., WWW'07). */
  val simhashBits = 48

  /** All pairs at Hamming distance <= maxHamming, by band rotation —
    * never by an all-pairs scan. The simhash is split into
    * (maxHamming + 1) equal bit-bands; by pigeonhole, any pair whose
    * simhashes differ in <= maxHamming bits must agree exactly on at
    * least one band, so candidate generation is a single equi-join on
    * (band_idx, band_bits) — the same shuffle shape as MinHash LSH
    * (candidatePairs), with bucket sizes ~ duplicate-cluster sizes.
    * Exact `bit_count(xor)` verification then touches only candidates,
    * and a final distinct collapses multi-band collisions.
    *
    * `sim` must have columns (idCol, simhash); callers should persist it
    * since both join sides read it. */
  def simhashBandPairs(sim: DataFrame, maxHamming: Int = 2,
                       idCol: String = "doc_id",
                       maxBucket: Int = 0): DataFrame = {
    val nBands = maxHamming + 1
    require(simhashBits % nBands == 0,
      s"simhashBits=$simhashBits not divisible into ${nBands} bands")
    val bandBits = simhashBits / nBands
    val mask = (1L << bandBits) - 1
    val exploded = sim.select(col(idCol), col("simhash"),
      posexplode(array((0 until nBands).map(j =>
        shiftright(col("simhash"), j * bandBits).bitwiseAND(lit(mask))): _*))
        .as(Seq("band_idx", "band_bits")))
    // the exact form pre-flight-refuses a hot corpus instead of dying
    // by spill on one reducer (r15 verdict #4 — the same unguarded
    // shape the minhash fixture builders already front); `sim` is
    // caller-persisted, so the histogram reads the cache the join
    // reuses
    if (maxBucket <= 0)
      refuseHotGroups(exploded, Seq("band_idx", "band_bits"),
        maxUnguardedSimhashBucket(sim.sparkSession),
        "unguarded simhash band self-join")
    // maxBucket > 0 df-caps the bit-band buckets (see SkewGuard) — the
    // pigeonhole completeness claim then holds only for pairs with a
    // collision in a sub-cap bucket; default 0 = exact
    val bands = SkewGuard.capBuckets(exploded,
      Seq("band_idx", "band_bits"), maxBucket)
    // Carry each side's full simhash through the join so verification
    // needs no extra join back to `sim`.
    val a = bands.select(col(idCol).as("a_id"), col("simhash").as("ha"),
      col("band_idx"), col("band_bits"))
    val b = bands.select(col(idCol).as("b_id"), col("simhash").as("hb"),
      col("band_idx").as("band_idx_b"), col("band_bits").as("band_bits_b"))
    a.join(b,
        col("band_idx") === col("band_idx_b") &&
        col("band_bits") === col("band_bits_b") &&
        col("a_id") < col("b_id"))
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("a_id"), col("b_id"), col("hamming"))
      .distinct()
  }

  /** Connected components over an undirected pair list — dedup-cluster
    * assignment: every doc in a near-dup component gets the component's
    * minimum doc id as its cluster id, so "keep one doc per cluster" is
    * a single groupBy downstream.
    *
    * Algorithm: hash-to-min label propagation. L(v) starts at v; each
    * round sets L(v) := min(L(v), min over neighbors of L(u)); the loop
    * stops when no label changes. The min label travels one hop per
    * round, so rounds = component diameter — near-dup clusters are
    * dense and shallow (single-digit diameter), independent of corpus
    * size. Each round is one equi-join plus one groupBy-min, both
    * hash-partitioned on vertex id — the d3 shuffle shape, never
    * all-pairs.
    *
    * Materialization discipline (this is where iterative DataFrames go
    * wrong):
    *  - the input pair list is persisted HERE, before anything reads it:
    *    the vertex set reads it twice (the id union) and the edge list
    *    twice more (the direction union) — without the persist, the
    *    caller's whole upstream pipeline (for d7 that is d3's LSH
    *    candidate join + Jaccard verify) re-executes up to 4x;
    *  - each round re-plans from the previous round's persisted row RDD
    *    (`LogicalRDD`), which truncates logical-plan lineage exactly like
    *    `localCheckpoint` (one join per round would otherwise nest and
    *    analysis cost grows exponentially — the standard iterative-
    *    DataFrame trap; GraphFrames checkpoints the same way) BUT, unlike
    *    a local checkpoint, the superseded round can be unpersisted
    *    EAGERLY the moment its successor is materialized, so at most two
    *    rounds of labels (plus the edges) ever hold storage;
    *  - one action per round: the `changed` count both materializes the
    *    round's RDD and tests convergence.
    * Per-round broadcast hints create one BroadcastExchange each; those
    * are freed by the ContextCleaner once the superseded round's plan is
    * unreferenced (eagerly dropping our references each round is what
    * lets it). Throws if the graph fails to converge within `maxIters` —
    * a silent cap would return WRONG labels for vertices farther than
    * maxIters hops from their component's minimum; graphs that deep
    * should use [[connectedComponentsStar]] (alternating large-star/
    * small-star contraction, O(log^2 n) rounds regardless of diameter).
    */
  def connectedComponents(pairs: DataFrame, aCol: String = "a_id",
                          bCol: String = "b_id",
                          maxIters: Int = 50,
                          broadcastVertexLimit: Long = 1000000L): DataFrame = {
    val spark = pairs.sparkSession
    import org.apache.spark.storage.StorageLevel
    val p = pairs
      .select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // materialize the pair graph in ONE pass before the unions below:
    // their first action otherwise touches p through TWO cold scans in
    // one job, and with every core busy both branches' tasks compute
    // the caller's whole upstream pipeline concurrently (the block
    // store dedups the RESULT, not the work — r16 plan audit measured
    // the LSH candidate+verify subtree running twice under exactly
    // this shape)
    val nPairs = p.count()

    var (labels, labelsRdd) = materializeRound(
      p.select(col("src").as("id")).union(p.select(col("dst").as("id")))
        .distinct().withColumn("label", col("id")))
    // a dedup pair graph is tiny relative to the corpus that produced
    // it; when the vertex set fits a broadcast (default cap 1M vertices
    // ~ 16 MB of (id,label) rows — small enough that a fresh broadcast
    // per round never pressures driver/executor storage), ship the label
    // map to the cached edge list and the round plan is broadcast-join +
    // one hash aggregation. Huge graphs fall back to the shuffled
    // equi-join on vertex id, with the edge list persisted
    // PRE-PARTITIONED on dst so its cached partitioning satisfies the
    // join distribution every round (the broadcast path skips that
    // shuffle — a broadcast join puts no distribution requirement on
    // the edges).
    //
    // Round shape (r16 job audit — these queries are DISPATCH-bound at
    // bench scale, so per-round jobs are the lever):
    //  - SELF-LOOPS are folded into the edge list once at init, so
    //    next(v) = min over N(v) ∪ {v} of labels = the hash-to-min
    //    update in ONE aggregation — no join-back onto the old labels,
    //    no second broadcast (the r15 round built and shipped TWO
    //    broadcasts per round: labels and nbrMin);
    //  - convergence is tested on SUM(label): labels are per-vertex
    //    monotone non-increasing (self included in the min), so the
    //    sum is strictly decreasing until the fixed point — the test
    //    rides the same action that materializes the round (decimal
    //    accumulator: a billion-vertex sum of int64 ids would overflow
    //    a long accumulator, and under ANSI that throws);
    //  - the broadcast path persists the edge list PRE-PARTITIONED on
    //    src: hash(src) satisfies the aggregation's distribution (and
    //    the init distinct's (src, dst) clustering), so the whole round
    //    runs with NO exchange — r15's round paid one shuffle stage.
    //    Partition count is SIZE-ADAPTIVE (~100k pair rows per task,
    //    capped at the session parallelism): the conf default (= local
    //    core count here) gave every round's 1-task-worth of agg work
    //    32 tasks, each paying a broadcast fetch + hash-relation build
    //    (r16 measured task_ms DOUBLING from exactly that).
    val vSum = labels.agg(count(lit(1)),
      sum(col("label").cast("decimal(38,0)"))).head()
    val bcast = vSum.getLong(0) <= broadcastVertexLimit
    val edgesAll = p.union(p.select(col("dst"), col("src")))
      .union(labels.select(col("id").as("src"), col("id").as("dst")))
    val nPart = math.max(1L, math.min(
      spark.sparkContext.defaultParallelism.toLong, nPairs / 100000L)).toInt
    val edges =
      (if (bcast) edgesAll.repartition(nPart, col("src")).distinct()
       else edgesAll.distinct().repartition(col("dst"))).persist()
    var prevSum = vSum.getDecimal(1)
    var converged = false
    var iters = 0
    while (!converged && iters < maxIters) {
      val lab = if (bcast) broadcast(labels) else labels
      val (next, nextRdd) = materializeRound(
        edges.join(lab, edges("dst") === lab("id"))
          .groupBy(col("src")).agg(min(col("label")).as("label"))
          .select(col("src").as("id"), col("label")))
      // one action: materializes the round AND reads the convergence sum
      val roundSum = next.agg(sum(col("label").cast("decimal(38,0)")))
        .head().getDecimal(0)
      labelsRdd.unpersist(false) // superseded round: release eagerly
      labels = next
      labelsRdd = nextRdd
      converged = java.util.Objects.equals(prevSum, roundSum)
      prevSum = roundSum
      iters += 1
    }
    edges.unpersist()
    p.unpersist()
    if (!converged) {
      // release the final round too — nothing is returned, so nothing
      // would ever track it (the Star variant's throw path does the same)
      labelsRdd.unpersist(false)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIters rounds — " +
          "component diameter exceeds the cap; raise maxIters or use " +
          "connectedComponentsStar for long-path graphs")
    }
    // the returned frame is backed by the final round's persisted RDD
    // (catalog.clearCache() cannot free it) — register it for release
    graft.core.CacheScope.trackRdd(labelsRdd, spark)
    labels.select(col("id").as("doc_id"), col("label").as("cluster_id"))
  }

  /** Connected components by alternating large-star / small-star
    * contraction (Kiveris et al., "Connected Components in MapReduce and
    * Beyond", SoCC'14) — the long-diameter escape hatch for
    * [[connectedComponents]]: hash-to-min needs diameter-many rounds,
    * star contraction converges in O(log^2 n) rounds regardless of
    * diameter (a path graph of length 10^6 finishes in ~20 rounds, not
    * 10^6).
    *
    * Each round is two passes over the edge list, each the same shape as
    * a hash-to-min round — a groupBy-min on one endpoint plus a
    * projection, all hash-partitioned by vertex, never all-pairs:
    *  - large-star: for every vertex u, connect each STRICTLY LARGER
    *    neighbor to m(u) = min(N(u) ∪ {u});
    *  - small-star: orient each edge large→small, then for every vertex
    *    u connect each smaller neighbor (and u itself) to the minimum.
    * Both operations preserve connectivity and strictly shrink a
    * monovariant (sum of parent pointers), so termination is guaranteed;
    * at the fixed point the edge set is a star forest (every vertex
    * points at its component minimum). Output matches
    * [[connectedComponents]]: (doc_id, cluster_id = component min id),
    * one row per vertex including the minimum itself. Same
    * materialization discipline as hash-to-min: rounds re-plan from a
    * persisted row RDD, superseded rounds released eagerly; convergence
    * is tested with a symmetric `except` on the (tiny, contracted) edge
    * set. */
  def connectedComponentsStar(pairs: DataFrame, aCol: String = "a_id",
                              bCol: String = "b_id",
                              maxIters: Int = 50): DataFrame = {
    val spark = pairs.sparkSession
    import org.apache.spark.storage.StorageLevel

    // large-star: emit (v, m(u)) for v ∈ N(u), v > u. The edge (u, m)
    // itself is kept by small-star, which follows immediately.
    def largeStar(e: DataFrame): DataFrame = {
      val nbrs = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      val m = nbrs.groupBy(col("src"))
        .agg(least(min(col("dst")), col("src")).as("m"))
        .select(col("src").as("mu"), col("m"))
      nbrs.join(m, col("src") === col("mu"))
        .filter(col("dst") > col("src"))
        .select(col("dst").as("src"), col("m").as("dst"))
        .distinct()
    }

    // small-star: orient large→small, connect u and its smaller
    // neighbors to their minimum.
    def smallStar(e: DataFrame): DataFrame = {
      val oriented = e.select(
        greatest(col("src"), col("dst")).as("src"),
        least(col("src"), col("dst")).as("dst"))
      val m = oriented.groupBy(col("src")).agg(min(col("dst")).as("m"))
        .select(col("src").as("mu"), col("m"))
      oriented.join(m, col("src") === col("mu"))
        .select(col("dst").as("v"), col("mu").as("u"), col("m"))
        .select(explode(array(
            struct(col("v").as("src"), col("m").as("dst")),
            struct(col("u").as("src"), col("m").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
    }

    val p = pairs
      .select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // one-pass materialization before the multi-scan reads below — the
    // same cold-double-scan race note as in [[connectedComponents]]
    p.count()
    var (edges, edgesRdd) = materializeRound(
      p.filter(col("src") =!= col("dst")).distinct())
    // remember every vertex — from the UNFILTERED pairs, so a vertex that
    // appears only in a self-pair still gets a (trivial) label, matching
    // connectedComponents; contraction also drops vertices once they
    // point directly at the component minimum with no larger neighbor.
    // Materialized eagerly (the count): its lineage reads the round-0
    // edge RDD, which round 1 unpersists.
    val (vertices, verticesRdd) = materializeRound(
      p.select(col("src").as("id")).union(p.select(col("dst").as("id")))
        .distinct())
    verticesRdd.count()
    edgesRdd.count()
    p.unpersist() // both reads of p are materialized now
    var converged = false
    var iters = 0
    while (!converged && iters < maxIters) {
      val (next, nextRdd) = materializeRound(smallStar(largeStar(edges)))
      // fixed point: edge sets equal (both tiny — the graph only
      // shrinks). Both sides are DISTINCT by construction, so equal
      // counts plus next ⊆ edges is full set equality — one except job
      // instead of two per round (the check was a third of the round's
      // actions; exactness is kept, no hash shortcut)
      converged =
        next.count() == edges.count() && next.except(edges).isEmpty
      edgesRdd.unpersist(false)
      edges = next
      edgesRdd = nextRdd
      iters += 1
    }
    if (!converged) {
      edgesRdd.unpersist(false)
      verticesRdd.unpersist(false)
      throw new IllegalStateException(
        s"connectedComponentsStar did not converge in $maxIters rounds " +
          "(needs O(log^2 n); raise maxIters)")
    }
    // star forest: every non-root vertex has exactly one edge to its
    // root; roots (and any vertex whose component contracted away, e.g.
    // a 2-cycle collapsing to one edge) label themselves via the left
    // join's coalesce
    val roots = edges.groupBy(col("src")).agg(min(col("dst")).as("root"))
    val out = vertices.join(roots, vertices("id") === roots("src"), "left")
      .select(col("id").as("doc_id"),
        coalesce(col("root"), col("id")).as("cluster_id"))
    // force the result's RDD before releasing edges/vertices — the caller
    // consumes `res` after this returns, and an unpersisted lineage here
    // would re-run every contraction round at that point
    val (res, resRdd) = materializeRound(out)
    resRdd.count()
    edgesRdd.unpersist(false)
    verticesRdd.unpersist(false)
    // same release contract as connectedComponents: the result's backing
    // RDD is freed by CacheScope.releaseAll(), not catalog.clearCache()
    graft.core.CacheScope.trackRdd(resRdd, spark)
    res
  }

  /** Incremental cluster maintenance — fold a NEW batch of verified
    * near-dup pairs into a STANDING (doc_id, cluster_id) labeling
    * without re-running connected components over the full corpus pair
    * graph. This closes the operational gap between the incremental
    * pair screens ([[incrementalNeardup]],
    * [[graft.streaming.StreamDedup.againstIndex]]) and the cluster
    * consumers (d8/d10/d13 need LABELS, not pairs): every ingest can
    * now update the labels instead of re-clustering the corpus.
    *
    * Correctness: the standing labeling IS a star forest — each row
    * (doc_id, cluster_id) is an edge from a member to its component
    * minimum (roots are self-loops). A star forest has exactly the
    * same connectivity as the pair graph it came from, so CC over
    * (star edges ∪ new pairs) yields the same components as CC over
    * (old pairs ∪ new pairs) — and the component minimum is preserved
    * because old cluster ids ARE member doc ids. The output therefore
    * hash-matches a from-scratch [[connectedComponents]] over the
    * combined pair graph (the d14 registration checks this against the
    * d7 oracle verbatim).
    *
    * Cost: the input to CC is |labels| + |newPairs| edges — corpus
    * pair counts never appear (a dense standing cluster of c members
    * contributed O(c²) pairs to the original run but exactly c star
    * edges here). Components untouched by new pairs are already
    * star-shaped and contract in one round; the iteration count is
    * driven by how many components the new pairs CHAIN together, which
    * [[connectedComponentsStar]]'s O(log² n) contraction bounds
    * regardless of that chain length (its fixed point — every vertex
    * pointing at its component minimum — is exactly the star-forest
    * invariant this function maintains round over round).
    *
    * Cost (round 13, contract-first): the standing labels never flow
    * through the CC rounds at all. Because the labeling is a star
    * forest, every new pair can be CONTRACTED up front — each endpoint
    * replaced by its standing label (one left join per side; an
    * unlabeled endpoint represents itself) — and CC runs only on the
    * contracted pair graph, whose nodes are cluster ids and
    * pair-touched unlabeled ids: |newPairs| edges, not
    * |labels| + |newPairs|. One remap join per output side puts the
    * result back on doc granularity. Output-identical to CC over
    * (star edges ∪ new pairs): a contracted component's minimum node
    * id IS the merged component's minimum doc id, because every
    * cluster id is already the minimum of its star and unlabeled ids
    * represent themselves (ProbeMergeCost measured the uncontracted
    * form's CC at ~1.7 s of d14b's 3 s — the labels frame was paying
    * the per-round joins despite contributing no connectivity the
    * contraction doesn't keep). */
  def mergeIntoClusters(labels: DataFrame, newPairs: DataFrame,
                        aCol: String = "a_id", bCol: String = "b_id"): DataFrame = {
    val l = labels.select(col("doc_id"), col("cluster_id"))
    val remap = mergeRemap(l, newPairs, aCol, bCol)
    val updated = l.join(remap, l("cluster_id") === col("__node"), "left")
      .select(col("doc_id"), coalesce(col("__new"), col("cluster_id")).as("cluster_id"))
    // contracted nodes that are no standing doc = new (batch) members
    val newRows = remap.join(l, remap("__node") === l("doc_id"), "left_anti")
      .select(col("__node").as("doc_id"), col("__new").as("cluster_id"))
    updated.unionByName(newRows)
  }

  /** The CHANGED-ROWS form of [[mergeIntoClusters]] — the merge-on-read
    * publish half the streaming label maintainer needs at the 100 TB
    * design point: instead of the full post-merge labeling (O(standing
    * labels) rows per call, which a per-trigger publisher would rewrite
    * in full every micro-batch), this returns only the rows the merge
    * CHANGED — standing docs whose cluster relabeled (the members of
    * clusters the new pairs chained together) plus the new pair-touched
    * docs. Upserting the returned delta onto the standing labels by
    * doc_id reproduces [[mergeIntoClusters]]'s output row for row
    * (spec-pinned in MergeClustersSpec), so a base+delta reader and the
    * full-rewrite publisher are interchangeable.
    *
    * Size contract: |delta| <= (total membership of the clusters this
    * batch's pairs touch) + |new batch docs in pairs| — ingest-
    * proportional in the operational case (a micro-batch touches the
    * clusters its docs duplicate), never corpus-proportional. The
    * standing labels are SCANNED (one broadcast-remap join — the same
    * scan [[mergeIntoClusters]] pays) but never rewritten. */
  def mergeIntoClustersDelta(labels: DataFrame, newPairs: DataFrame,
                             aCol: String = "a_id", bCol: String = "b_id"): DataFrame = {
    val l = labels.select(col("doc_id"), col("cluster_id"))
    val remap = mergeRemap(l, newPairs, aCol, bCol)
    // standing docs whose cluster id actually moved: the remap hit rows
    // where the new root differs (the component min can keep its id —
    // those rows are unchanged and must NOT inflate the delta)
    val changed = l.join(remap, l("cluster_id") === col("__node"))
      .filter(col("__new") =!= col("cluster_id"))
      .select(col("doc_id"), col("__new").as("cluster_id"))
    val newRows = remap.join(l, remap("__node") === l("doc_id"), "left_anti")
      .select(col("__node").as("doc_id"), col("__new").as("cluster_id"))
    changed.unionByName(newRows)
  }

  /** Shared contraction + CC core of the two merge forms: (node,
    * newRoot) for every contracted node — cluster ids whose component
    * merged, and pair-touched unlabeled ids (columns `__node`,
    * `__new`). */
  private def mergeRemap(l: DataFrame, newPairs: DataFrame,
                         aCol: String, bCol: String): DataFrame = {
    val np = newPairs.select(col(aCol).cast("long").as("a_id"),
      col(bCol).cast("long").as("b_id"))
    val contracted = np
      .join(l.select(col("doc_id").as("a_id"), col("cluster_id").as("__ra")),
        Seq("a_id"), "left")
      .join(l.select(col("doc_id").as("b_id"), col("cluster_id").as("__rb")),
        Seq("b_id"), "left")
      .select(coalesce(col("__ra"), col("a_id")).as("a_id"),
        coalesce(col("__rb"), col("b_id")).as("b_id"))
      .filter(col("a_id") =!= col("b_id"))
    // (node, newRoot) for every contracted node — cluster ids whose
    // component merged, and pair-touched unlabeled ids. Hash-to-min CC
    // (the same engine d7's corpus clustering runs): its broadcast-
    // vertex fast path costs ~2 actions per round vs star contraction's
    // ~8, and the contracted graph's diameter is the number of clusters
    // a single batch CHAINS — ingest-sized, not corpus-sized. A
    // pathological batch CAN exceed the 50-round diameter cap (e.g. a
    // whole-corpus backfill delivered as one trigger chaining hundreds
    // of clusters in a path), so the star form is a REAL escape hatch
    // here, not a comment: hash-to-min's convergence failure is caught
    // and the merge reruns on the O(log² n) contraction, which is
    // diameter-independent. Both produce identical min-id labels.
    val remapCc =
      try connectedComponents(contracted)
      catch {
        case e: IllegalStateException
            if e.getMessage != null && e.getMessage.contains("did not converge") =>
          connectedComponentsStar(contracted)
      }
    remapCc.select(col("doc_id").as("__node"), col("cluster_id").as("__new"))
  }

  /** SimHash over a doc's distinct tokens: bit j of the result is set
    * iff the sum over tokens of (+1 if token-bit j else -1) is positive.
    * `tokRows` must have columns (doc_id, t).
    *
    * `hashMode` picks the per-token hash family (mirroring the minhash
    * modes in [[signaturesFromShingles]]):
    *  - `"md5"` (default): 48-bit value from the first 12 md5 hex chars,
    *    extracted with dialect-portable substring/instr arithmetic — the
    *    CROSS-ENGINE-DETERMINISTIC mode the DuckDB oracle reproduces
    *    bit-for-bit. The 48 substring ops per token are the price of
    *    portability.
    *  - `"xxh64"`: low 48 bits of a salted xxhash64 — codegen-native
    *    64-bit arithmetic end to end (one hash call + shift/mask per
    *    bit, no hex strings anywhere), the production mode for a large
    *    corpus. Same aggregation topology, so downstream banding
    *    (simhashBandPairs) and Hamming verification are identical;
    *    OUTPUT pairs depend on the hash because the simhash itself
    *    does — near-identical token sets still land within the Hamming
    *    radius under any uniform hash (each differing token shifts
    *    every bit sum by at most 2), which is what the cross-mode spec
    *    asserts. No DuckDB counterpart, hence not the default. */
  def simhash(tokRows: DataFrame, divOp: String = "div",
              hashMode: String = "md5"): DataFrame = {
    val withV = hashMode match {
      case "md5" => tokRows.withColumn("v",
        expr(hexValSql(s"substr(md5(t),1,${simhashBits / 4})", simhashBits / 4)))
      case "xxh64" => tokRows.withColumn("v",
        xxhash64(lit("simhash"), col("t")).bitwiseAND(lit((1L << simhashBits) - 1)))
      case other => throw new IllegalArgumentException(
        s"hashMode must be md5 or xxh64, got $other")
    }
    val bitSums = (0 until simhashBits).map { j =>
      val bitSet = hashMode match {
        // div-then-mod kept verbatim in md5 mode: the same SQL text runs
        // on DuckDB (divOp "//") for the oracle
        case "md5" => expr(s"(v $divOp ${1L << j}) % 2") === 1
        case _ => shiftright(col("v"), j).bitwiseAND(lit(1L)) === 1
      }
      sum(when(bitSet, 1).otherwise(-1)).as(s"b$j")
    }
    val agg = withV.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    val sim = (0 until simhashBits).map { j =>
      when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    agg.select(col("doc_id"), sim.cast("long").as("simhash"))
  }

  /** Token k-gram rows with 1-based positions: (idCol, pos, kgram, h)
    * where h = md5(kgram). Pure projection + generate — no shuffle.
    * Docs with fewer than k tokens contribute no rows. Shared by the
    * winnowing selection (which needs every position) and the span
    * decode join. */
  def kgramRows(docs: DataFrame, k: Int, textCol: String = "text",
                idCol: String = "doc_id"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    docs
      .select(col(idCol), split(col(textCol), "\\s+").as("__toks"))
      .select(col(idCol), posexplode(
          when(size(col("__toks")) >= k,
            transform(sequence(lit(1), size(col("__toks")) - (k - 1)), i =>
              concat_ws(" ", (0 until k).map(j =>
                element_at(col("__toks"), i + lit(j))): _*)))
            .otherwise(array().cast("array<string>")))
        .as(Seq("__p0", "kgram")))
      .select(col(idCol), (col("__p0") + 1).cast("long").as("pos"),
        col("kgram"), md5(col("kgram")).as("h"))
  }

  /** Winnowed fingerprint selection (Schleimer, Wilkerson, Aiken,
    * "Winnowing: Local Algorithms for Document Fingerprinting",
    * SIGMOD 2003) over token k-grams: slide a window of w consecutive
    * k-gram hashes over each document and select each window's minimum
    * (ties broken by the leftmost position — encoded by taking the
    * string min of md5-hex || zero-padded position, which both engines
    * compare identically). Output: (idCol, pos, kgram, h), one row per
    * SELECTED fingerprint, density ~ 2/(w+1) of all positions.
    *
    * The winnowing GUARANTEE (the reason this beats stride sampling):
    * any two documents sharing an exact token run of length >=
    * k + w - 1 share at least one selected fingerprint — the shared
    * run contains a full window of w identical k-gram hashes in both
    * docs, whose minimum is the same VALUE in both, so both select it.
    * This is the candidate generator for exact-substring dedup (the
    * operation Lee et al., "Deduplicating Training Data Makes Language
    * Models Better", ACL 2022, motivates at training-corpus scale):
    * suffix arrays don't distribute, winnowing is embarrassingly
    * parallel — a pure per-doc projection + one window function,
    * partitioned by doc, then cross-doc matching is an equi-join on
    * the fingerprint. Near the end of a doc the trailing windows are
    * CLAMPED (frame shrinks) rather than dropped, so every doc with
    * >= 1 k-gram selects >= 1 fingerprint; extra selections never
    * weaken the guarantee (selection sets only grow).
    *
    * `kg` must be a [[kgramRows]] frame. This is the TEXTBOOK
    * window-function form, kept as the differential reference (and the
    * shape the DuckDB oracle runs); production uses
    * [[winnowFingerprints]], the same selection as a shuffle-free
    * array-domain projection. */
  def winnowSelect(kg: DataFrame, w: Int,
                   idCol: String = "doc_id"): DataFrame = {
    require(w >= 1, s"w must be >= 1, got $w")
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.currentRow, w - 1)
    // distinct BEFORE decode: the same position is the argmin of up to
    // w windows; selkey (h || pos) is unique per selected position
    kg
      .withColumn("__selkey",
        min(concat(col("h"), lpad(col("pos").cast("string"), 10, "0"))).over(win))
      .select(col(idCol), col("__selkey")).distinct()
      .select(col(idCol),
        substring(col("__selkey"), 1, 32).as("h"),
        substring(col("__selkey"), 33, 10).cast("long").as("pos"))
      .join(kg.select(col(idCol), col("pos"), col("kgram")), Seq(idCol, "pos"))
      .select(col(idCol), col("pos"), col("kgram"), col("h"))
  }

  /** [[winnowSelect]]'s selection computed entirely IN THE ARRAY
    * DOMAIN — the production formulation. The window-function form
    * shuffles and sorts every k-gram ROW by doc just to look w-1
    * positions ahead, but the k-grams of a doc are born co-located
    * (one generate from one doc row) and already position-ordered, so
    * the whole selection can run as a per-row projection: for each
    * window start p, min over q in [p, min(p+w-1, n)] of
    * h[q] || zero-padded q — the exact rowsBetween frame, clamped tail
    * included — then array_distinct, then ONE explode to fingerprint
    * rows. O(n·w) comparisons per doc (w is small) buys ZERO exchanges
    * before the cross-doc pair join; at 100 TB the avoided shuffle is
    * the corpus's entire token stream. Output and contract identical
    * to [[winnowSelect]] (spec-asserted equal row for row on real
    * corpus text in `WinnowSpec`; the DuckDB oracle runs the
    * window-function form, so the equivalence is also hash-checked
    * cross-engine through d15). */
  def winnowFingerprints(docs: DataFrame, k: Int, w: Int,
                         textCol: String = "text",
                         idCol: String = "doc_id"): DataFrame = {
    require(k >= 1 && w >= 1, s"k and w must be >= 1, got k=$k w=$w")
    val kgArr = docs
      .select(col(idCol), split(col(textCol), "\\s+").as("__toks"))
      .select(col(idCol),
        when(size(col("__toks")) >= k,
          transform(sequence(lit(1), size(col("__toks")) - (k - 1)), i =>
            concat_ws(" ", (0 until k).map(j =>
              element_at(col("__toks"), i + lit(j))): _*)))
          .otherwise(array().cast("array<string>")).as("kg"))
      .select(col(idCol), col("kg"),
        transform(col("kg"), g => md5(g)).as("__h"))
    // sequence(1, 0) would DESCEND, so empty k-gram arrays are guarded
    val selkeys = when(size(col("kg")) >= 1,
      array_distinct(transform(sequence(lit(1), size(col("kg"))), p =>
        array_min(transform(
          sequence(p, least(p + lit(w - 1), size(col("kg")))), q =>
          concat(element_at(col("__h"), q),
            lpad(q.cast("string"), 10, "0")))))))
      .otherwise(array().cast("array<string>"))
    kgArr
      .select(col(idCol), col("kg"), explode(selkeys).as("__selkey"))
      .select(col(idCol),
        substring(col("__selkey"), 33, 10).cast("long").as("pos"),
        element_at(col("kg"),
          substring(col("__selkey"), 33, 10).cast("int")).as("kgram"),
        substring(col("__selkey"), 1, 32).as("h"))
  }

  /** Cross-document shared-span detection over winnowed fingerprints:
    * pairs of documents sharing >= `minShared` selected k-gram
    * fingerprints, with the earliest shared position on each side.
    * EXACT — the join matches on the k-gram TEXT (the md5 is only the
    * equi-join key), so every reported pair shares >= minShared literal
    * k-token substrings, and by the winnowing guarantee every pair
    * sharing a token run of length >= k + w - 1 in >= minShared
    * selected windows is reported.
    *
    * Scale shape: selection is a pure per-row projection
    * ([[winnowFingerprints]] — no exchange at all on the selection
    * side); the only corpus-wide shuffle is the fingerprint
    * equi-join, whose bucket sizes are fingerprint posting lists —
    * boilerplate k-grams (license headers, nav chrome) make hot
    * buckets, so `maxBucket` > 0 arms [[SkewGuard.capBuckets]] on the
    * fingerprint hash exactly like the MinHash band join (drop
    * semantics; cap sizing guidance there). Output columns:
    * (a_id, b_id, shared_fps, first_a_pos, first_b_pos). */
  /** Maximal VERIFIED shared-span extents — the step after
    * [[winnowSharedSpans]]'s pair report that exact-substring dedup
    * (Lee et al. ACL'22) actually acts on: WHERE the duplicated run
    * sits in each document, so a curation pass can drop or trim it.
    *
    * Construction: matched fingerprint anchors (exact k-gram equality,
    * as in winnowSharedSpans) live on a DIAGONAL b_pos - a_pos that is
    * constant across one contiguous shared run. Per (pair, diagonal),
    * anchors whose position gaps are <= w are merged gaps-and-islands
    * style (inside a true shared run winnowing selects an anchor in
    * every w-window, so consecutive matched anchors are at most w
    * apart); each island becomes a candidate extent
    * [min anchor, max anchor + k - 1].
    *
    * Exactness: for merge gap w <= k (the default here) extents are
    * exact BY CONSTRUCTION — two matched anchors p, q with q - p <= w
    * <= k carry k-gram matches [p, p+k-1] and [q, q+k-1] whose union
    * covers every token in [p, q+k-1], so by induction an island's
    * whole extent is covered by matched (identical, same-diagonal)
    * k-grams. Equivalently: one differing token invalidates the k
    * k-grams covering it, leaving an anchor gap >= k+1 > w, so islands
    * can never bridge a difference. The token-slice comparison against
    * both documents is therefore a cheap certified-output invariant
    * (and the safety net if a caller overrides the gap above k), not a
    * recall filter; the spec pins both the coverage and the
    * no-bridging behavior.
    *
    * Scale shape: selection is the shuffle-free projection; anchors
    * are the d15 equi-join; the island window repartitions only the
    * ANCHOR rows (bounded by shared-fingerprint mass, not the corpus);
    * verification joins extents back to the two token arrays by id.
    * Output: (a_id, b_id, a_start, a_end, b_start, b_end, span_len,
    * n_anchors), token positions 1-based inclusive. */
  def winnowSpanExtents(docs: DataFrame, k: Int, w: Int,
                        minLen: Long, maxBucket: Int = 0,
                        textCol: String = "text",
                        idCol: String = "doc_id"): DataFrame = {
    val toksFrame = graft.core.CacheScope.track(
      docs.select(col(idCol), split(col(textCol), "\\s+").as("__t")).persist())
    val raw = graft.core.CacheScope.track(
      winnowFingerprints(docs, k, w, textCol, idCol).persist())
    // the unguarded anchor join buckets on the fingerprint hash —
    // boilerplate k-grams make exactly the hot posting lists the
    // refusal exists for (BASELINE: ~53k rows in one zipf bucket →
    // ~1.4e9 pairs from that bucket alone); the histogram warms the
    // persisted selection the join reads anyway
    if (maxBucket <= 0)
      refuseHotGroups(raw, Seq("h"),
        maxUnguardedBucket(docs.sparkSession),
        "unguarded winnow fingerprint self-join")
    val fp = SkewGuard.capBuckets(raw, Seq("h"), maxBucket)
    val a = fp.select(col(idCol).as("a_id"), col("pos").as("a_pos"),
      col("kgram").as("__ka"), col("h"))
    val b = fp.select(col(idCol).as("b_id"), col("pos").as("b_pos"),
      col("kgram").as("__kb"), col("h").as("__hb"))
    val anchors = a.join(b,
        col("h") === col("__hb") && col("__ka") === col("__kb") &&
        col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), col("a_pos"), col("b_pos"),
        (col("b_pos") - col("a_pos")).as("__diag"))
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy(col("a_id"), col("b_id"), col("__diag"))
      .orderBy(col("a_pos"))
    val prev = lag(col("a_pos"), 1).over(wOrd)
    val isl = anchors
      .withColumn("__new",
        when(prev.isNull || col("a_pos") - prev > w, 1L).otherwise(0L))
      .withColumn("__island", sum(col("__new")).over(wOrd.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)))
    val ext = isl
      .groupBy(col("a_id"), col("b_id"), col("__diag"), col("__island"))
      .agg(min(col("a_pos")).as("a_start"),
        (max(col("a_pos")) + lit(k - 1)).as("a_end"),
        count(lit(1)).as("n_anchors"))
      .withColumn("b_start", col("a_start") + col("__diag"))
      .withColumn("b_end", col("a_end") + col("__diag"))
      .withColumn("span_len", col("a_end") - col("a_start") + 1)
      .filter(col("span_len") >= minLen)
    ext
      .join(toksFrame.select(col(idCol).as("a_id"), col("__t").as("__ta")), "a_id")
      .join(toksFrame.select(col(idCol).as("b_id"), col("__t").as("__tb")), "b_id")
      .filter(slice(col("__ta"), col("a_start").cast("int"),
          col("span_len").cast("int")) ===
        slice(col("__tb"), col("b_start").cast("int"),
          col("span_len").cast("int")))
      .select(col("a_id"), col("b_id"), col("a_start"), col("a_end"),
        col("b_start"), col("b_end"), col("span_len"), col("n_anchors"))
  }

  def winnowSharedSpans(docs: DataFrame, k: Int, w: Int,
                        minShared: Long = 2L, maxBucket: Int = 0,
                        textCol: String = "text",
                        idCol: String = "doc_id"): DataFrame = {
    // the RAW fingerprint frame is persisted (the d3 sigs precedent):
    // the guard's occupancy aggregate AND both self-join sides read the
    // cached selection instead of re-scanning the corpus per consumer
    val raw = graft.core.CacheScope.track(
      winnowFingerprints(docs, k, w, textCol, idCol).persist())
    // pre-flight refusal for the exact form (r15 verdict #4) — the
    // d15 "NEVER time on zipf" doc rule made executable: the anchor
    // join's buckets are fingerprint posting lists, quadratic per
    // bucket on one task
    if (maxBucket <= 0)
      refuseHotGroups(raw, Seq("h"),
        maxUnguardedBucket(docs.sparkSession),
        "unguarded winnow fingerprint self-join")
    val fp = SkewGuard.capBuckets(raw, Seq("h"), maxBucket)
    val a = fp.select(col(idCol).as("a_id"), col("pos").as("a_pos"),
      col("kgram").as("__ka"), col("h"))
    val b = fp.select(col(idCol).as("b_id"), col("pos").as("b_pos"),
      col("kgram").as("__kb"), col("h").as("__hb"))
    a.join(b,
        col("h") === col("__hb") && col("__ka") === col("__kb") &&
        col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("shared_fps"),
        min(col("a_pos")).as("first_a_pos"),
        min(col("b_pos")).as("first_b_pos"))
      .filter(col("shared_fps") >= minShared)
  }
}
