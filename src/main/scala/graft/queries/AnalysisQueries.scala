package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.ext.{Multimodal, TextAnalysis => TA}
import graft.functions.RollingHash.rolling_hash

/** Text-analysis + multimodal queries over `documents` — the extended
  * training-data-pipeline surface (builder prompt; beyond SURVEY §2).
  */
object AnalysisQueries extends QueryGroup {

  private[queries] def toks = split(col("text"), "\\s+")
  private[queries] val toksSql = "string_split_regex(text, '\\s+')"
  private[queries] def sqlIn(words: Seq[String]) =
    // '' -escape embedded quotes: safe for the static stopword list, and
    // keeps any future corpus-derived caller from generating broken (or
    // injectable) oracle SQL
    words.map(w => s"'${w.replace("'", "''")}'").mkString(", ")

  /** The quality product as dialect-shared SQL over a `documents` row —
    * the ONE SQL-side counterpart of TA.qualityFromStaged, spliced into
    * every oracle that scores quality (x_text_stats, x_curation_pipeline,
    * x_corpus_report, d10_cluster_best). */
  private[queries] lazy val qualitySql: String =
    s"""(least(CAST(len($toksSql) AS DOUBLE), 100.0) / 100.0)
       |    * (1.0 - CAST(len(list_filter($toksSql, t -> t IN (${sqlIn(graft.ops.TextOps.stopWords)}))) AS DOUBLE)
       |        / greatest(CAST(len($toksSql) AS DOUBLE), 1.0))
       |    * (1.0 - CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE)
       |        / greatest(CAST(length(text) AS DOUBLE), 1.0))""".stripMargin

  /** Per-document stats + deterministic quality score. The token array
    * is STAGED into a materialized column first: inlining `split` into
    * each consumer would re-split the text once per scoring expression
    * (higher-order-function lambdas re-evaluate inlined subtrees, and
    * CollapseProject rightly refuses to merge a non-cheap expr used
    * many times). */
  def textStats(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .select(col("doc_id"), col("text"), toks.as("__toks"))
      .select(col("doc_id"),
        octet_length(col("text")).cast("long").as("n_bytes"),
        size(col("__toks")).cast("long").as("n_tokens"),
        TA.stopwordRatio(col("__toks")).as("stopword_ratio"),
        TA.punctRatio(col("text")).as("punct_ratio"))
      // quality rebuilt from the staged ratios — the canonical product
      // (TA.qualityFromStaged), without re-running the punct scan and
      // the stopword filter a second time per row
      .withColumn("quality", TA.qualityFromStaged(col("n_tokens"),
        col("stopword_ratio"), col("punct_ratio")))
    // full-output queries: no presentation sort (order-insensitive gate)

  /** Heuristic language ID via stopword-profile overlap (token array
    * staged once — see textStats). */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val p = TA.langProfiles
    Tables(spark, dir).documents
      .select(col("doc_id"), col("lang"), toks.as("__toks"))
      .select(col("doc_id"), col("lang").as("labeled_lang"),
        TA.profileScore(col("__toks"), p("en")).as("s_en"),
        TA.profileScore(col("__toks"), p("de")).as("s_de"),
        TA.profileScore(col("__toks"), p("fr")).as("s_fr"),
        TA.profileScore(col("__toks"), p("es")).as("s_es"))
      .withColumn("pred_lang",
        TA.predictLang(col("s_en"), col("s_de"), col("s_fr"), col("s_es")))
  }

  /** Token counts: whitespace and BPE-ish regex pre-tokenization. */
  def tokenCounts(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .select(col("doc_id"),
        TA.tokenCount(col("text")).as("ws_tokens"),
        TA.bpeTokenCount(col("text")).as("bpe_tokens"))

  /** Key-collision fingerprint (sorted distinct tokens -> md5). */
  def fingerprints(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .select(col("doc_id"), TA.fingerprint(toks).as("fingerprint"))

  /** Rolling polynomial hash via the custom codegen Expression. The
    * DuckDB oracle reproduces the base-31 int64 fold with HUGEINT
    * arithmetic mod 2^64 over the UTF-8 bytes (hex-pair decode), then
    * recasts to signed — full hash-match, plus the unit test against
    * the Scala reference implementation. */
  def rollingFingerprints(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .select(col("doc_id"), rolling_hash(col("text")).as("rhash"))

  /** Corpus integrity checksum per (lang, source): order-independent
    * multiplicative checksum (mod 2^64) of per-doc content hashes — the
    * custom-Aggregator surface (SURVEY.md §2.9) composed with the
    * custom rolling-hash Expression. Comparing these checksums across
    * two copies/runs of a corpus detects changed, missing, or
    * duplicated documents with one partial-aggregated pass: no sort, no
    * full-content shuffle, result independent of row order and
    * partitioning. */
  def groupChecksum(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .select(col("lang"), col("source"),
        rolling_hash(col("text")).bitwiseOR(1).as("u"))
      .groupBy(col("lang"), col("source"))
      .agg(graft.agg.ModProduct.product_mod64(col("u")).as("checksum"),
        count(lit(1)).as("n_docs"))
      .orderBy(col("lang"), col("source"))

  /** Multimodal metadata decode over binary payloads (stub codec —
    * deterministic fake; see Multimodal.fakeDecode). When the sf dir
    * ships a true binary media table (`media.parquet` — ScaleUp emits
    * one), decode THAT, exercising real parquet BINARY IO; the
    * driver-provided dirs have no media column, so the oracle-checked
    * path decodes UTF-8 text payloads as before. */
  /** The media frame: true parquet BINARY where a fixture exists
    * (ScaleUp replicas), documents-text-as-payload on the driver dirs
    * (which is what the DuckDB oracles mirror via encode(text)). */
  private[queries] def mediaSource(spark: SparkSession, dir: String): DataFrame = {
    val mediaPath = s"$dir/media.parquet"
    if (new java.io.File(mediaPath).exists()) spark.read.parquet(mediaPath)
    else Tables(spark, dir).documents
  }

  def multimodalMeta(spark: SparkSession, dir: String): DataFrame =
    Multimodal.decodeMeta(mediaSource(spark, dir)).toDF()

  /** Binary -> fixed-dim content features, one column per dim (array
    * compare is hash-fragile across engines; named doubles are not).
    * Dim count comes from the ONE constant the featurizer, this
    * projection, and the oracle all share — a divergence would
    * otherwise surface as silent null f-columns (getItem past the
    * array end). */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    val d = Multimodal.FeatureDims
    val f = Multimodal.features(mediaSource(spark, dir), d)
    f.select(col("doc_id") +:
      (0 until d).map(j => col("features").getItem(j).as(s"f$j")): _*)
  }

  def frameSample(spark: SparkSession, dir: String): DataFrame =
    Multimodal.sampleFrames(mediaSource(spark, dir))

  /** Frame-level ANN (x_frame_ann) — the video-retrieval composition:
    * sampled frames ([[Multimodal.frameFeatures]], one feature vector
    * per frame, executor-side slicing) ranked by exact snapped cosine
    * against a probe clip's frames, same-doc matches excluded. Probe
    * side is the doc_id < 4 clips only — the filter reaches the scan
    * below the mapPartitions decode, and the probe frames broadcast
    * into the corpus-frame scan (the y1/y14 pairwise shape; at scale
    * the corpus side would feed the packed-codes tier exactly like
    * x_media_ann). The oracle rebuilds frame slicing + featurizer +
    * cosine relationally on the pure-ASCII corpus. */
  def frameAnn(spark: SparkSession, dir: String): DataFrame = {
    val snap = (f: DataFrame) => f.select(col("doc_id"), col("frame_idx"),
        graft.ext.Similarity.snapVec(col("features")).as("sv"))
      .withColumn("nrm", graft.ext.Similarity.normSnapped(col("sv")))
    val corpus = snap(Multimodal.frameFeatures(mediaSource(spark, dir)))
    val probes = snap(Multimodal.frameFeatures(
        mediaSource(spark, dir).filter(col("doc_id") < 4)))
      .select(col("doc_id").as("p_doc"), col("frame_idx").as("p_frame"),
        col("sv").as("pv"), col("nrm").as("pn"))
    val scored = corpus.join(broadcast(probes), col("doc_id") =!= col("p_doc"))
      .withColumn("cos", graft.ext.Similarity.cosineFromSnapped(
        col("pv"), col("sv"), col("pn"), col("nrm")))
      .select(col("p_doc"), col("p_frame"), col("doc_id").as("n_doc"),
        col("frame_idx").as("n_frame"), col("cos"))
    graft.ops.TopK.perKey(scored, Seq("p_doc", "p_frame"),
        Seq("cos" -> true, "n_doc" -> false, "n_frame" -> false), 5)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("p_doc"), col("p_frame"))
          .orderBy(col("cos").desc, col("n_doc"), col("n_frame"))).cast("long"))
      .select(col("p_doc"), col("p_frame"), col("n_doc"), col("n_frame"),
        col("rank"), col("cos"))
      .orderBy(col("p_doc"), col("p_frame"), col("rank"))
  }

  def resizePlanQ(spark: SparkSession, dir: String): DataFrame =
    Multimodal.resizePlan(
      Multimodal.decodeMeta(mediaSource(spark, dir)).toDF())

  /** Deterministic hash sampling — reproducible train/eval splits. The
    * bucket is the first 32 bits of md5(doc_id) mod 100, so membership
    * is a property of the ROW, not of the run: re-executions, retries,
    * and different cluster sizes all select the same ~10% — unlike
    * `df.sample`, whose RNG is seeded per-partition and reshuffles
    * membership when partitioning changes. Pure projection + filter,
    * no shuffle, fraction accuracy by the law of large numbers. */
  def hashSample(spark: SparkSession, dir: String): DataFrame = {
    val bucket =
      expr(graft.ext.Dedup.hexValSql("substr(md5(cast(doc_id as string)),1,8)", 8)) % 100
    Tables(spark, dir).documents
      .select(col("doc_id"), bucket.cast("long").as("bucket"))
      .filter(col("bucket") < 10)
  }

  /** PII scrubbing — the redaction pass every training corpus needs:
    * count and mask email addresses and long digit runs (phone/account
    * shaped). Stock codegen'd regex expressions, pure projection; the
    * patterns are RE2-compatible so the same scrub runs on any engine.
    * A production pass adds more patterns (SSN, IP, street addresses) —
    * same plan shape, one `regexp_replace` chain per pattern. */
  def piiScrub(spark: SparkSession, dir: String): DataFrame = {
    val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val numRe = "[0-9]{6,}"
    Tables(spark, dir).documents.select(
      col("doc_id"),
      regexp_count(col("text"), lit(emailRe)).cast("long").as("n_emails"),
      regexp_count(col("text"), lit(numRe)).cast("long").as("n_longnums"),
      regexp_replace(regexp_replace(col("text"), emailRe, "<EMAIL>"),
        numRe, "<NUM>").as("scrubbed"))
  }

  /** Train/eval decontamination — flag training docs that share word
    * 3-grams with a held-out eval set. The eval set is the
    * deterministic md5-bucket sample (< 5%), so the split is
    * reproducible. In the real use case the eval side is a fixed
    * benchmark suite — thousands of docs — and the optimizer broadcasts
    * its distinct n-gram set, streaming the corpus through a broadcast
    * hash join with no shuffle. The hint is deliberately NOT forced:
    * this synthetic eval split is corpus-proportional, and a forced
    * broadcast of a corpus-sized side would die on the broadcast limit
    * instead of degrading to a shuffled equi-join. Per-doc overlap
    * counts let the caller pick a drop threshold. Reuses the dedup
    * module's staged shingle frame. */
  def decontaminate(spark: SparkSession, dir: String): DataFrame = {
    import graft.ext.Dedup
    val bucket =
      expr(Dedup.hexValSql("substr(md5(cast(doc_id as string)),1,8)", 8)) % 100
    // persisted: both the eval and train branches read this frame, and
    // recomputing it would tokenize + shingle the corpus twice; tracked
    // so library callers can release it (CacheScope.releaseAll) instead
    // of it living for the session
    val sh = graft.core.CacheScope.track(
      Dedup.shingleFrame(Tables(spark, dir).documents)
        .withColumn("__b", bucket.cast("long"))
        .persist())
    val evalNgrams = sh.filter(col("__b") < 5)
      .select(explode(col("sh")).as("ng")).distinct()
    val trainNgrams = sh.filter(col("__b") >= 5)
      .select(col("doc_id"), explode(col("sh")).as("ng")) // sh is distinct per doc
    trainNgrams.join(evalNgrams, Seq("ng"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_contaminated"))
  }

  /** Bloom-filter decontamination screen — the shape [[decontaminate]]
    * takes when the benchmark set outgrows a broadcast hash join of raw
    * n-gram STRINGS: the eval split's shingles are folded into an
    * m = 2^18-bit Bloom filter (3 md5-derived hashes), and the corpus is
    * screened by probing bits in that broadcast — ~32 KB regardless of
    * how many n-grams it encodes (size m at ~14 bits/element for ~0.1%
    * false positives; the FP rate only costs a few extra docs in the
    * verify pass a real pipeline runs behind the screen). The screen
    * itself is a pure projection per (doc, shingle) — 3 hashes + 3 map
    * probes, no join against eval data at all; the only shuffle left is
    * the per-doc count. Bits live in a word-indexed long map so the
    * build is one tiny aggregation, not a dense-array construction.
    *
    * Everything is md5-derived and integer, so the flagged set is
    * engine-exact: the DuckDB oracle reproduces the SAME bit positions
    * and flags a shingle iff all three of its positions are set —
    * including genuine Bloom false positives, which are deterministic
    * given the hash family. Superset-of-exact is spec-asserted against
    * [[decontaminate]]. */
  def bloomDecontaminate(spark: SparkSession, dir: String): DataFrame =
    bloomDecontaminate(spark, dir, "md5")

  /** `hashMode`: "md5" (registered default — DuckDB reproduces the bit
    * positions exactly) or "xxh64" (production — one codegen'd
    * xxhash64 per probe instead of an md5 + hex fold; same contract as
    * the minhash/simhash modes, superset-of-exact spec-asserted in
    * both modes). */
  def bloomDecontaminate(spark: SparkSession, dir: String,
                         hashMode: String): DataFrame = {
    import graft.ext.{Bloom, Dedup}
    val m = Bloom.DefaultM
    val bucket =
      expr(Dedup.hexValSql("substr(md5(cast(doc_id as string)),1,8)", 8)) % 100
    val sh = graft.core.CacheScope.track(
      Dedup.shingleFrame(Tables(spark, dir).documents)
        .withColumn("__b", bucket.cast("long"))
        .persist())
    // build: the eval split's distinct n-grams folded into the bit
    // array (word-indexed bit_or, at most m/64 rows however large the
    // eval set) and COLLECTED — 32 KB, bounded by m regardless of
    // corpus size; the w5-style documented bounded collect. Embedding
    // it as a literal makes the screen one whole-stage-codegen'd
    // projection with O(1) array probes — no join node at all. (The
    // 1-row cross-join alternative pushed the probe into a
    // BroadcastNestedLoopJoin condition, evaluated interpreted per
    // shingle: 3.2 s warm at sf0.1 in md5 mode.)
    val bits = Bloom.buildBits(sh.filter(col("__b") < 5)
      .select(explode(col("sh")).as("ng")).distinct(), hashMode, m)
    // Screen-side plan discipline, every step measured (ProfileBloom):
    // - md5 mode STAGES the digest before the position slices (the
    //   three conv slices each reference the staged column once;
    //   inlined, md5 would run once per slice — and under the
    //   pre-conv instr-fold family an unstaged digest ran 8x per
    //   hash: 29 s at sf0.1. CollapseProject's non-cheap-used-twice
    //   rule preserves the staging).
    // - The probe is a PROJECTED 0/1 column summed through the
    //   aggregate, NOT a row filter: a Filter is pushed below the
    //   staging projections by substitution (PushDownPredicates),
    //   re-inlining the hash chain into the filter while the
    //   projection above recomputes it — 7.5 s warm.
    // - Probes are null-safe <=> (Bloom.bitTest): ordinary =!= lets
    //   InferFiltersFromConstraints grow a vacuous isnotnull filter
    //   with the same re-inlining problem — 8.9 s warm.
    // - The bit array is a dense long ARRAY, not a map: Spark map
    //   lookups scan MapData linearly — 30 s warm.
    // - All 3 positions SLICE one staged digest (Bloom.md5Stage —
    //   the minhash chunk discipline): the per-position salted md5
    //   family paid 3 digests/shingle for 3.4 s warm; one digest
    //   sliced is 1.7 s warm. The oracle mirrors the slices, so the
    //   deterministic-FP set moves with the family on both engines.
    // Final: 1.7 s warm md5 (the floor is ONE md5/shingle —
    // DigestUtils per call; the oracle price), 1.9 s in xxh64 mode.
    val staged = hashMode match {
      case "md5" =>
        sh.filter(col("__b") >= 5)
          .select(col("doc_id"), explode(col("sh")).as("ng"))
          .select(col("doc_id"), Bloom.md5Stage(col("ng")).as("hx"))
          .select(col("doc_id") +: (0 until 3).map(j =>
            Bloom.posFromMd5Stage(j, col("hx"), m).as(s"h$j")): _*)
      case _ =>
        sh.filter(col("__b") >= 5)
          .select(col("doc_id"), explode(col("sh")).as("ng"))
          .select(col("doc_id") +: Bloom.positions(col("ng"), hashMode, m)
            .zipWithIndex.map { case (p, j) => p.as(s"h$j") }: _*)
    }
    val hit = (0 until 3).map(j => Bloom.bitTest(bits, col(s"h$j"))).reduce(_ && _)
    staged
      .select(col("doc_id"), when(hit, 1L).otherwise(0L).as("__f"))
      .groupBy(col("doc_id"))
      .agg(sum(col("__f")).as("n_flagged"))
      .filter(col("n_flagged") > 0)
  }

  /** Corpus accounting report — the rollup a corpus team reads before
    * and after every curation step: per (lang, source) cell plus both
    * marginals and the grand total (ROLLUP-style via grouping sets),
    * with doc/token/char volumes and the count of docs passing the
    * curation quality bar. One pass, one shuffle on the grouping sets
    * (Spark expands them inside a single hash aggregate); all counts
    * int64 and the one ratio a final IEEE division, so every cell
    * hash-matches. The NULL-vs-total ambiguity is resolved the
    * standard way: explicit grouping flags, not sentinel strings. */
  def corpusReport(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .select(col("lang"), col("source"),
        octet_length(col("text")).cast("long").as("nb"),
        TA.tokenCount(col("text")).as("nt"),
        split(col("text"), "\\s+").as("__toks"), col("text"))
      .select(col("lang"), col("source"), col("nb"), col("nt"),
        (TA.qualityScore(col("__toks"), col("text")) >= 0.5)
          .cast("long").as("q"))
      .cube(col("lang"), col("source"))
      .agg(grouping(col("lang")).cast("long").as("g_lang"),
        grouping(col("source")).cast("long").as("g_source"),
        count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"),
        sum(col("nb")).as("n_bytes"), sum(col("q")).as("n_quality"),
        (sum(col("q")).cast("double") / count(lit(1)).cast("double"))
          .as("quality_rate"))
      .select(col("g_lang"), col("g_source"), col("lang"), col("source"),
        col("n_docs"), col("n_tokens"), col("n_bytes"), col("n_quality"),
        col("quality_rate"))

  /** Stratified deterministic sampling — different keep-fractions per
    * language (upsample scarce strata, downsample dominant ones), with
    * the same run-stable md5-bucket membership as [[hashSample]]. Still
    * a pure projection + filter: the stratum only selects the
    * threshold, so there is no shuffle and no per-stratum pass. */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val bucket =
      expr(graft.ext.Dedup.hexValSql("substr(md5(cast(doc_id as string)),1,8)", 8)) % 100
    val thr = Map("en" -> 10, "de" -> 25, "fr" -> 40, "es" -> 60)
      .foldLeft(lit(5)) { case (acc, (l, t)) =>
        when(col("lang") === l, t).otherwise(acc)
      }
    Tables(spark, dir).documents
      .select(col("doc_id"), col("lang"), bucket.cast("long").as("bucket"))
      .filter(col("bucket") < thr)
  }

  /** Rare-token score — the cross-document noise signal: the share of
    * a doc's tokens whose CORPUS frequency is below a rarity floor
    * (gibberish, codes, OCR junk score high; x_repetition is the
    * within-doc complement). The tfidf stage-reuse shape: ONE corpus
    * tokenize + shuffle to (doc, token) counts; the corpus-frequency
    * branch derives from that aggregate with the subtree unchanged (the
    * tautological `cnt > 0` keeps the exchanges canonically equal, so
    * AQE reuses the shuffle stage instead of re-scanning the corpus —
    * see tfidfTopK), and everything downstream is vocab/doc-sized.
    * All exact int64 until the final ratio division. */
  def rareTokenScore(spark: SparkSession, dir: String): DataFrame = {
    val tok = Tables(spark, dir).documents
      .select(col("doc_id"), toks.as("__toks"))
      .select(col("doc_id"), explode_outer(col("__toks")).as("tok"))
      .filter(col("tok").isNotNull) // attribute input: see sourceOverlap
    val tf = tok.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("cnt"))
    val freq = tf.filter(col("cnt") > 0) // tautological — canonical equality
      .groupBy(col("tok")).agg(sum(col("cnt")).as("cf"))
    tf.join(freq, "tok")
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_tok"),
        sum(when(col("cf") < 5, col("cnt")).otherwise(0L)).as("n_rare"))
      .select(col("doc_id"), col("n_tok"), col("n_rare"),
        (col("n_rare").cast("double") / col("n_tok").cast("double"))
          .as("rare_ratio")) // n_tok >= 1 always (split of "" is [""])
  }

  /** End-to-end curation, round-4 edition — the new operators COMPOSED
    * the way a real corpus-prep job chains them: near-dup removal
    * (d8's cluster-canonical filter, subsuming exact dedup), a token-
    * length quality gate, then fixed-budget sequence packing of the
    * SURVIVING corpus into per-shard training windows. One DAG: the
    * cluster-frame joins stay AQE-adaptive, the only ordered operation
    * is the per-shard cumulative sum, and each survivor carries
    * n_merged so downstream loss-weighting can account for collapsed
    * duplicates. (x_curation_pipeline is the round-2 single-pass
    * filter chain; this one exercises the heavy pipeline stages.) */
  def curatePack(spark: SparkSession, dir: String): DataFrame =
    curatePack(spark, dir, DedupQueries.dupClusters(spark, dir))

  /** Composition form: run the same curation against a PRE-COMPUTED
    * (doc_id, cluster_id) frame, so a pipeline that already ran d7
    * (and persisted its output — it is backed by a persisted RDD
    * anyway) never pays connected components twice. The registered
    * query is this overload fed a fresh d7; spec-asserted identical. */
  def curatePack(spark: SparkSession, dir: String,
                 clusters: org.apache.spark.sql.DataFrame): DataFrame =
    graft.ext.Curation.curateWith(Tables(spark, dir).documents, clusters)

  /** The packing stage shared by x_pack_sequences and x_curate_pack —
    * owned by [[graft.ext.Curation.packIntoSequences]] (the composable
    * API); scale note there (see also packSequences). */
  private def packIntoSequences(df: DataFrame, nShards: Int = 8,
                                budget: Long = 4096L): DataFrame =
    graft.ext.Curation.packIntoSequences(df, nShards, budget)

  /** Cross-source overlap audit: for every source pair, how many
    * distinct shingles they share — the contamination matrix that says
    * which corpus slices leak into each other (the pairwise, corpus-
    * internal complement of x_decontaminate's corpus-vs-eval check).
    * Shape: ONE corpus-sized shuffle — explode to (shingle, source)
    * rows, codegen-distinct them (map-side partial agg eats the
    * duplicate hits), then collect the per-shingle source list (input
    * already deduped and shingle-partitioned) and generate the source
    * pairs INSIDE each row's array (≤ |sources| elements, a handful),
    * counted in a matrix-sized second agg. A distinct + self-join
    * formulation measured 11 s at sf1 (three shuffles of the exploded
    * frame); this one keeps everything after the distinct
    * sub-corpus-sized. */
  def sourceOverlap(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    // explode_outer + post-filter, NOT explode: exploding an ATTRIBUTE
    // column makes InferFiltersFromGenerate plant an implicit
    // `size(sh) > 0` filter, and predicate pushdown rewrites it in terms
    // of the raw text — re-inlining the whole shingling expression into
    // a per-row Filter and computing it twice (measured ~2x, 8.9 -> 1.9 s
    // warm at sf1; complex-expression generator inputs never get the
    // filter, probe-verified). The outer variant generates first; the
    // null-filter then runs on the generated column, recomputing nothing.
    val sets = graft.ext.Dedup.shingleFrame(docs)
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
      .select(explode_outer(col("sh")).as("shingle"), col("source"))
      .filter(col("shingle").isNotNull)
      .distinct() // codegen hash agg; ObjectHashAggregate sees deduped rows only
      .groupBy(col("shingle"))
      .agg(sort_array(collect_list(col("source"))).as("srcs"))
    // all (a < b) pairs of the (sorted) per-shingle source set
    sets.select(explode(flatten(transform(col("srcs"), (x, i) =>
        transform(slice(col("srcs"), i + 2, size(col("srcs"))),
          y => struct(x.as("source_a"), y.as("source_b")))))).as("p"))
      .groupBy(col("p.source_a").as("source_a"), col("p.source_b").as("source_b"))
      .agg(count(lit(1)).as("n_shared_shingles"))
  }

  /** Mixture weights: per-source token shares and the renormalization
    * weight that would equalize the training mixture across sources —
    * the sampling-weight computation behind "balance the corpus by
    * source" (weight > 1: upsample, < 1: downsample; feed them to the
    * stratified sampler's per-stratum rates). One per-source hash agg
    * (map-side combined) plus a 1-row broadcast of the corpus totals —
    * the same scalar-broadcast shape as x_tfidf_topk's corpus size;
    * each ratio is one int64->double division/multiply so both engines
    * agree bit-for-bit. */
  def mixtureWeights(spark: SparkSession, dir: String): DataFrame = {
    val per = Tables(spark, dir).documents
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(TA.tokenCount(col("text"))).as("n_tokens"))
    val tot = per.agg(sum(col("n_tokens")).as("total_tokens"),
      count(lit(1)).as("n_sources"))
    per.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        (col("n_tokens").cast("double") / col("total_tokens").cast("double"))
          .as("token_share"),
        (col("total_tokens").cast("double") /
          (col("n_sources").cast("double") * col("n_tokens").cast("double")))
          .as("weight"))
  }

  /** Balanced sampling — the CONSUMER of x_mixture_weights: sample each
    * source at rate min(1, base · weight_s), so the kept corpus's token
    * mass is (approximately) equalized across sources — upsampled
    * sources keep everything, oversized ones thin out. Membership is
    * the same run-stable md5 bucket as x_hash_sample (a property of the
    * row, not the run), at 1e6 granularity so the rate resolves finely;
    * the weight frame is sources-sized and broadcasts. One corpus scan,
    * no shuffle of the docs. */
  def balancedSample(spark: SparkSession, dir: String): DataFrame = {
    val base = 0.5
    val rates = mixtureWeights(spark, dir)
      .select(col("source"),
        least(lit(1.0), lit(base) * col("weight")).as("rate"))
    val bucket = expr(graft.ext.Dedup.hexValSql(
      "substr(md5(cast(doc_id as string)),1,8)", 8)) % 1000000
    Tables(spark, dir).documents
      .select(col("doc_id"), col("source"))
      .join(broadcast(rates), "source")
      .withColumn("bucket", bucket.cast("long"))
      .filter(col("bucket").cast("double") < col("rate") * lit(1000000.0))
      .select(col("doc_id"), col("source"), col("bucket"), col("rate"))
  }

  /** Sequence packing with a SEEDED SHUFFLE order — the production form
    * of x_pack_sequences: consecutive doc ids are correlated (same
    * source, same crawl window), so training packs should order docs by
    * a deterministic pseudo-random key instead of id. Order = md5 of a
    * seed-prefixed id: decorrelated, yet identical across re-runs and
    * cluster sizes (resumable preprocessing, like everything keyed off
    * the hash-bucket trick). Same per-shard cumsum scale shape — the
    * shard-local sort just uses the shuffled key. */
  def packShuffled(spark: SparkSession, dir: String,
                   seed: String = "seed42", nShards: Int = 8,
                   budget: Long = 4096L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("__ord"), col("doc_id"))
    Tables(spark, dir).documents
      .select(col("doc_id"), TA.tokenCount(col("text")).as("n_tok"))
      .withColumn("shard", pmod(col("doc_id"), lit(nShards.toLong)))
      .withColumn("__ord",
        md5(concat(lit(s"${seed}_"), col("doc_id").cast("string"))))
      .withColumn("cum", sum(col("n_tok")).over(w))
      .withColumn("seq_id", expr(s"(cum - n_tok) div $budget"))
      .select(col("doc_id"), col("shard"), col("n_tok"), col("seq_id"))
  }

  /** Sequence packing: assign each doc a (shard, seq_id) so consecutive
    * docs within a shard fill fixed 4096-token context windows — the
    * step that turns a curated corpus into training sequences. A doc
    * lands in the window its starting token offset falls in (running
    * per-shard token sum). Scale shape: the only ordered operation is
    * the per-shard cumulative-sum window, and shards are independent —
    * at 100 TB you set nShards to O(cluster cores) and each window is
    * one local sort over its shard partition, not a global order-by
    * (a single unsharded cumsum would serialize the whole corpus
    * through one partition). Packing is deterministic (shard =
    * doc_id % n, order = doc_id), so re-runs shard identically —
    * resumable preprocessing for free. */
  def packSequences(spark: SparkSession, dir: String,
                    nShards: Int = 8, budget: Long = 4096L): DataFrame =
    packIntoSequences(Tables(spark, dir).documents
        .select(col("doc_id"), TA.tokenCount(col("text")).as("n_tok")),
        nShards, budget)
      .select(col("doc_id"), col("shard"), col("n_tok"), col("seq_id"))

  /** Overlapping token-window chunking — the long-document step that
    * precedes packing and retrieval indexing: every document becomes
    * ceil(n/stride) windows of up to `window` tokens starting every
    * `stride` tokens (the last windows are shorter; consecutive windows
    * overlap by window − stride tokens so no span falls across an
    * unseen boundary). Scale shape: a pure per-row projection + one
    * generator — NO shuffle, no window function, no join; chunk
    * identity (doc_id, chunk_id) is a row property, so the operator is
    * embarrassingly parallel and re-runs/retries chunk identically at
    * any partitioning. Output cardinality is Σ ceil(n_i/stride) ≈
    * corpus_tokens/stride — linear in corpus size. */
  def chunkDocs(spark: SparkSession, dir: String,
                window: Int = 64, stride: Int = 48): DataFrame =
    Tables(spark, dir).documents
      .select(col("doc_id"), toks.as("__toks"))
      // n >= 1 always (split of "" is [""]), so every doc emits at
      // least one chunk and the sequence bound never inverts
      .withColumn("__n", size(col("__toks")).cast("long"))
      .withColumn("chunk_id", explode(
        sequence(lit(0L), expr(s"(__n + ${stride - 1}) div $stride") - 1)))
      .select(col("doc_id"), col("chunk_id"),
        slice(col("__toks"), (col("chunk_id") * stride + 1).cast("int"),
          lit(window)).as("__ck"))
      .select(col("doc_id"), col("chunk_id"),
        size(col("__ck")).cast("long").as("n_chunk_tokens"),
        concat_ws(" ", col("__ck")).as("chunk_text"))

  /** Bigram language-model quality score — the CCNet-style fluency
    * filter: each document is scored by the mean smoothed conditional
    * probability of its bigrams under the corpus's OWN bigram model,
    * p(w2|w1) = (C(w1,w2)+1) / (C(w1·)+B) with C(w1·) the leading-token
    * count and B the number of distinct bigram types (add-one over the
    * observed bigram vocabulary). Repetitive/templated text scores
    * high, gibberish scores low — the standard perplexity gate with the
    * log removed: probabilities are quantized to int64 at 1e-12 before
    * the per-doc mean, so the aggregation is an exact integer sum
    * (order- and partitioning-independent — a float log-prob sum would
    * hash-mismatch in the last ulp and flap across shuffles) and the
    * only float ops are one exact-input division and multiply per
    * bigram TYPE, both IEEE-correctly-rounded in every engine.
    *
    * Plan shape at scale: one corpus tokenize → (doc,w1,w2) counts
    * (map-side combine), the model tables DERIVED from that aggregate
    * (AQE reuses the shuffle stage — the `c > 0` tautology keeps the
    * subtree canonically equal, see tfidfTopK), then joins that are
    * vocab-sized on the build side and a 1-row broadcast of B. Docs
    * with fewer than two tokens have no bigrams and drop out. */
  def lmScore(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    // (doc, w1, w2, c): zip the token array against itself shifted by
    // one (zip_with pads the tail with null — the (w_n, null) pair is
    // dropped), counted per doc BEFORE any join so the model joins
    // carry bigram TYPES, not occurrences
    val docBg = docs
      .select(col("doc_id"), toks.as("__toks"))
      .select(col("doc_id"), explode_outer(zip_with(
        col("__toks"), slice(col("__toks"), lit(2), size(col("__toks"))),
        (x, y) => struct(x.as("w1"), y.as("w2")))).as("bg"))
      .filter(col("bg").isNotNull && col("bg.w2").isNotNull)
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy(col("doc_id"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("c"))
    // corpus model: bigram counts, leading-token counts, bigram-type
    // count — all derived from docBg's aggregate, no second corpus scan
    val cb = docBg.filter(col("c") > 0) // tautological — canonical equality
      .groupBy(col("w1"), col("w2")).agg(sum(col("c")).as("cb"))
    val cu = cb.groupBy(col("w1")).agg(sum(col("cb")).as("cu"))
    val nb = cb.agg(count(lit(1)).as("nb"))
    val pq = floor((col("cb") + 1).cast("double") /
        (col("cu") + col("nb")).cast("double") * lit(1e12) + lit(0.5))
      .cast("long")
    docBg
      .join(cb, Seq("w1", "w2"))
      .join(cu, Seq("w1"))
      .crossJoin(broadcast(nb))
      .withColumn("__pq", pq)
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_bigrams"), sum(col("c") * col("__pq")).as("__spq"))
      .select(col("doc_id"), col("n_bigrams"),
        (col("__spq").cast("double") /
          (col("n_bigrams").cast("double") * lit(1e12))).as("lm_score"))
  }

  /** Intra-document repetition score — boilerplate/spam signal: the
    * distinct-token ratio and the share of the single most frequent
    * token. Explode + two-level hash aggregation (partial map-side
    * combine on (doc, token), then per-doc), all codegen'd; ratios are
    * int64/int64 IEEE divisions so both engines agree bit-for-bit. */
  /** Gopher-style composite quality rules (Rae et al., "Scaling
    * Language Models: Methods, Analysis & Insights from Training
    * Gopher", 2021, §A1.1 — the published web-corpus filter suite):
    * per-document rule verdicts for word-count bounds, mean word
    * length, alphabetic-word ratio, bullet/ellipsis line shares, and
    * within-doc duplicate-line fraction, plus the conjunction. Every
    * measure is an array-domain pure projection over the staged token
    * and line arrays — no explode, no shuffle, one codegen span per
    * row; the thresholds are Gopher's published ones, not tuned to
    * the fixture. Complements x_repetition (token-level repetition via
    * one grouped pass) with the LINE-level duplicate measure Gopher
    * actually filters on. All divisions are exact int64 counts through
    * one IEEE division, so both engines compare identical doubles. */
  def gopherRules(spark: SparkSession, dir: String): DataFrame = {
    val nTok = size(col("__toks")).cast("long")
    val nLn = size(col("__lines")).cast("long")
    Tables(spark, dir).documents
      .select(col("doc_id"), toks.as("__toks"),
        split(col("text"), "\n").as("__lines"))
      .select(col("doc_id"),
        nTok.as("n_tokens"),
        (aggregate(transform(col("__toks"), t => length(t).cast("long")),
          lit(0L), (acc, x) => acc + x).cast("double") / nTok.cast("double"))
          .as("mean_tok_len"),
        (size(filter(col("__toks"), t => t.rlike("[a-zA-Z]"))).cast("double") /
          nTok.cast("double")).as("alpha_tok_ratio"),
        (size(filter(col("__lines"), l => l.rlike("^\\s*[-*•]")))
          .cast("double") / nLn.cast("double")).as("bullet_line_ratio"),
        (size(filter(col("__lines"), l => l.rlike("(\\.\\.\\.|…)\\s*$")))
          .cast("double") / nLn.cast("double")).as("ellipsis_line_ratio"),
        ((nLn - size(array_distinct(col("__lines")))).cast("double") /
          nLn.cast("double")).as("dup_line_frac"))
      .withColumn("r_word_count",
        col("n_tokens") >= 50L && col("n_tokens") <= 100000L)
      .withColumn("r_mean_len",
        col("mean_tok_len") >= 3.0 && col("mean_tok_len") <= 10.0)
      .withColumn("r_alpha", col("alpha_tok_ratio") >= 0.8)
      .withColumn("r_bullet", col("bullet_line_ratio") <= 0.9)
      .withColumn("r_ellipsis", col("ellipsis_line_ratio") <= 0.3)
      .withColumn("r_dup_lines", col("dup_line_frac") <= 0.3)
      .withColumn("pass_gopher",
        col("r_word_count") && col("r_mean_len") && col("r_alpha") &&
        col("r_bullet") && col("r_ellipsis") && col("r_dup_lines"))
  }

  def repetition(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .select(col("doc_id"), toks.as("__toks"))
      .select(col("doc_id"), size(col("__toks")).cast("long").as("n_tokens"),
        explode_outer(col("__toks")).as("tok")) // attribute input: see sourceOverlap
      .filter(col("tok").isNotNull)
      .groupBy(col("doc_id"), col("n_tokens"), col("tok"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"), col("n_tokens"))
      .agg(count(lit(1)).as("n_distinct"), max(col("c")).as("max_tok_count"))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        col("max_tok_count"),
        (col("n_distinct").cast("double") / col("n_tokens").cast("double"))
          .as("distinct_ratio"),
        (col("max_tok_count").cast("double") / col("n_tokens").cast("double"))
          .as("max_tok_share"))

  /** Top TF-IDF terms per document, through the custom TopKPerKey
    * operator (bounded heaps, no full per-doc sort). The plan is the
    * canonical distributed TF-IDF: one shuffle to (doc, term) counts,
    * one to term document-frequencies, a shuffled equi-join back on
    * term, and a 1-row broadcast of the corpus size N. The score is
    * integer-scaled — tf * (1e6*N div df) — so both engines compute the
    * identical int64 (a float log-idf would hash-mismatch in the last
    * ulp; integer reciprocal-df preserves the idf ranking). */
  def tfidfTopK(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    val tf = docs
      .select(col("doc_id"), toks.as("__toks"))
      .select(col("doc_id"), explode_outer(col("__toks")).as("tok"))
      .filter(col("tok").isNotNull) // attribute input: see sourceOverlap
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    // dfreq is derived from tf UNCHANGED below its aggregate, so AQE
    // reuses the (doc, tok) shuffle stage for both branches and the
    // corpus is scanned and aggregated ONCE. The tf > 0 predicate is a
    // tautology that exists only to keep the count in dfreq's subtree:
    // without it Catalyst prunes the inner aggregate to a distinct,
    // the two exchanges stop being canonically equal, and the reuse is
    // lost (double scan + double shuffle).
    val dfreq = tf.filter(col("tf") > 0)
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.as("t")
      .join(dfreq.as("d"), col("t.tok") === col("d.tok"))
      .crossJoin(broadcast(n))
      .select(col("t.doc_id").as("doc_id"), col("t.tok").as("tok"),
        col("t.tf").as("tf"), col("d.df").as("df"),
        (col("t.tf") * expr("(1000000 * n_docs) div df")).as("score"))
    graft.ops.TopK.perKey(scored, Seq("doc_id"),
      Seq(("score", true), ("tok", false)), 3)
  }

  /** End-to-end curation pipeline — the shape of a real training-data
    * job: exact-dedup to canonical docs, quality-score filter, language
    * ID, token budget. Composes the library ops in one declarative plan
    * (one window shuffle for dedup; everything else is projection +
    * scan-level filters). */
  def curationPipeline(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("text_md5"))
    val p = TA.langProfiles
    Tables(spark, dir).documents
      .withColumn("text_md5", md5(col("text")))
      .withColumn("canonical_id", min(col("doc_id")).over(w))
      .filter(col("doc_id") === col("canonical_id")) // exact dedup: keep canonical
      .select(col("doc_id"), col("text"), toks.as("__toks")) // stage: split once
      .select(col("doc_id"), col("text"),
        TA.qualityScore(col("__toks"), col("text")).as("quality"),
        size(col("__toks")).cast("long").as("n_tokens"),
        TA.profileScore(col("__toks"), p("en")).as("s_en"),
        TA.profileScore(col("__toks"), p("de")).as("s_de"),
        TA.profileScore(col("__toks"), p("fr")).as("s_fr"),
        TA.profileScore(col("__toks"), p("es")).as("s_es"))
      .withColumn("pred_lang",
        TA.predictLang(col("s_en"), col("s_de"), col("s_fr"), col("s_es")))
      .filter(col("quality") >= 0.5 && col("n_tokens").between(20, 200))
      .select(col("doc_id"), col("quality"), col("n_tokens"), col("pred_lang"))
      .orderBy(col("doc_id"))
  }

  /** Hashed-feature linear quality classifier — the deployment shape of
    * a trained fastText-style filter at 100 TB: each token maps to a
    * weight via the hashing trick (no vocabulary table, no join — the
    * "model" lives inside the expression), the per-doc score is the
    * squashed mean weight. Here the weights are md5-derived placeholders
    * (weight(t) = hex16(md5 t) − 32768 ∈ [−32768, 32767]) so the oracle
    * reproduces them; swapping in real learned weights changes only the
    * hash→weight map, not the plan. Scale shape: a pure per-row
    * projection — zero shuffles, zero joins, whole-stage codegen; the
    * sum is exact int64 via `aggregate` over the staged token array
    * (no explode, so no row blow-up), and the only float ops are one
    * division, one multiply, one abs and two adds per DOC (the
    * rational squash x/(1+|x|) replaces exp-sigmoid because exp is not
    * correctly-rounded across engines — same monotone S-shape, exact
    * IEEE agreement). */
  def qualityClassifier(spark: SparkSession, dir: String): DataFrame =
    qualityClassifier(spark, dir, "md5")

  /** `hashMode` picks the hash→weight family, same contract as the
    * minhash/simhash/bloom modes: `"md5"` (default) is the
    * DuckDB-reproducible oracle mode (4 substr+instr ops per token);
    * `"xxh64"` derives the weight from one salted codegen-native
    * xxhash64 per token — the production setting. Scores differ across
    * modes (different placeholder weights — a REAL deployment ships
    * learned weights anyway); the plan shape and every determinism
    * property are identical. */
  def qualityClassifier(spark: SparkSession, dir: String,
                        hashMode: String): DataFrame = {
    // weights as a staged array: the md5 mode computes ONE digest per
    // token in an inner transform, then parses the 16-bit value from
    // the staged hex in the outer lambda with one codegen'd conv (the
    // ORACLE keeps the portable substr/instr fold — DuckDB has no
    // conv; identical values). Staging still matters: lambda bodies
    // get no CSE, so an inlined md5 would hash once per reference.
    val weights = hashMode match {
      case "md5" =>
        s"transform(transform(__toks, t -> substr(md5(t), 1, 4)), " +
          s"h -> CAST(conv(h, 16, 10) AS BIGINT) - CAST(32768 AS BIGINT))"
      case "xxh64" =>
        "transform(__toks, t -> pmod(xxhash64('qc', t), " +
          "CAST(65536 AS BIGINT)) - CAST(32768 AS BIGINT))"
      case other => throw new IllegalArgumentException(
        s"hashMode must be md5 or xxh64, got $other")
    }
    Tables(spark, dir).documents
      .select(col("doc_id"), toks.as("__toks"))
      .select(col("doc_id"),
        size(col("__toks")).cast("long").as("n_tokens"),
        expr(s"aggregate($weights, CAST(0 AS BIGINT), (acc, x) -> acc + x)")
          .as("raw"))
      // n_tokens >= 1 always (split of "" is [""]) — no 0-denominator
      .withColumn("__m", col("raw").cast("double") /
        (col("n_tokens").cast("double") * lit(32768.0)))
      .select(col("doc_id"), col("n_tokens"), col("raw"),
        (lit(0.5) + lit(0.5) * col("__m") / (lit(1.0) + abs(col("__m"))))
          .as("score"))
  }

  /** Heavy hitters via count-min sketch + exact verify — corpus-wide
    * boilerplate n-gram detection (shingles whose document frequency
    * reaches `threshold`; the df signal the winnow/band caps act on,
    * here surfaced as its own report). Plan shape, the production
    * heavy-hitters pattern: ONE bounded aggregation builds the d×w
    * sketch (≤ d·w rows shuffle however large the corpus, collected as
    * 256 KB of literals), then the screen probes the sketch as a pure
    * projection and only CANDIDATE occurrences reach the exact
    * vocabulary-keyed aggregation — the naive plan shuffles every
    * occurrence into a vocabulary-sized groupBy. A CMS estimate never
    * undercounts, so the screen has COMPLETE recall for `df >=
    * threshold` and the exact pass removes exactly the
    * collision-inflated false positives: the registration shares the
    * plain HAVING oracle verbatim — the cross-engine proof that the
    * sketch screen changes cost, not answers (the d3_salted /
    * d15_capped oracle-sharing precedent). The STAGED frame (the
    * occurrence stream carrying its materialized digest) is the one
    * persist — it feeds both the build and the screen, and the cache
    * is what makes the screen's filter safe to leave unpersisted: a
    * pushed-down predicate re-inlines only the cheap positional slices,
    * never the digest ([[graft.ext.CountMin.stagedEstimate]]'s
    * contract; the former second corpus-sized est persist was measured
    * pure overhead and removed in r14). */
  def heavyShingles(spark: SparkSession, dir: String): DataFrame =
    heavyShingles(spark, dir, "md5")
  def heavyShingles(spark: SparkSession, dir: String,
                    hashMode: String, thresholdFrac: Double = 0.01): DataFrame = {
    import graft.ext.{CountMin, Dedup}
    val docs = Tables(spark, dir).documents
    // FRACTIONAL threshold — heavy means "in >= frac of documents",
    // re-derived from the corpus count each run, so the dial keeps its
    // meaning as the corpus grows (the sf100 probe measured what an
    // absolute threshold does at 1000×: every shingle crosses it, the
    // screen admits 100%, and the query degenerates to the naive
    // full-stream aggregation plus sketch overhead). 1% of 500 gate
    // docs = the original demo threshold of 5, answer unchanged.
    val threshold = math.ceil(thresholdFrac * docs.count()).toLong
    val occ = Dedup.shingleFrame(docs)
      // explode_outer + null filter: the bare-explode attribute-input
      // trap (see sourceOverlap) would triple-compute the shingling
      .select(explode_outer(col("sh")).as("ng"))
      .filter(col("ng").isNotNull)
    // md5 mode persists the STAGED prefix — ONE md5 per occurrence
    // total (sliced into the d row positions, shared by the build and
    // the screen; staging measured 12.4→4.8 s at sf0.1 when each row
    // still salted its own digest, and the slice family then cut the
    // remaining 4 digests to 1); xxh64 hashes inline, raw frame is fine
    val staged = graft.core.CacheScope.track(
      (if (hashMode == "md5") CountMin.stagePrefixes(occ) else occ).persist())
    val sketch = CountMin.build(staged, hashMode)
    // the screen filter runs UNPERSISTED over the staged cache: pushing
    // it through the estimate projection re-inlines only the conv/
    // substring slices (md5 mode) or d codegen xxhash64 calls — the
    // digest itself is a MATERIALIZED column of the persisted frame, so
    // the expensive hash never re-runs. The est frame used to be a
    // second corpus-sized persist guarding against that re-inline;
    // measured at the 500k-doc decade, dropping it is the difference
    // between materializing ~50M (ng, est) rows and four int ops per
    // occurrence: md5 14.2 -> 10.0 s, xxh64 7.9 -> 5.2 s (BASELINE
    // r14), identical output (the oracle hash-checks it per round).
    CountMin.stagedEstimate(staged, sketch, hashMode)
      .filter(col("est") >= threshold)
      .groupBy(col("ng"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= threshold)
      .orderBy(col("ng"))
  }

  /** Per-source SHINGLE vocabulary: distinct 3-gram cardinality +
    * occurrence totals by source — the dataset-profiling question
    * ("how much novel text does each source contribute?") over the
    * domain that actually grows with the corpus. The token vocabulary
    * is the wrong domain here (this synthetic corpus holds ~31 distinct
    * tokens — measured, like the C4-rule vacuity finding); the shingle
    * space is hapax-heavy (315k distinct in 50k zipf docs) and scales.
    * The EXACT form is the oracle-checked registration; its cost is
    * the distinct itself — Spark plans count(DISTINCT) as a
    * (source, ng)-keyed pre-aggregation, so the exchange carries one
    * row per distinct pair: VOCABULARY-sized however large the corpus.
    * The production twin (`x_vocab_by_source_hll`, prodVariants) swaps
    * in `approx_count_distinct` — a HyperLogLog++ sketch that merges
    * map-side, so the exchange carries one fixed-size sketch per
    * (source, partition) regardless of vocabulary. HLL already appears
    * in `a8_approx_distinct` (user cardinality, self-bounded check);
    * what this pair adds is the oracle-pays-exact /
    * production-runs-sketch SPLIT of x_heavy_shingles on a domain
    * where the sketch's exchange advantage is real, plus the plan pin
    * that proves it (Bloom = membership, CMS = frequency, HLL =
    * cardinality — each with an exact cross-engine anchor). rsd 2% and the
    * map-side partial are spec-pinned (`VocabSketchSpec`); `ngrams` is
    * sketch-free in both forms, so the twins must agree on it exactly.
    * RAW occurrences (no per-doc distinct): the count is corpus mass,
    * mirrored exactly in the oracle. */
  def vocabBySource(spark: SparkSession, dir: String): DataFrame =
    vocabBySource(spark, dir, exact = true)

  /** (source, ng) shingle occurrences, split STAGED before shingles3
    * (the shingleFrame discipline): passing the raw split expression
    * re-evaluates it inside the shingle lambda's element_at calls —
    * measured 6.8 s vs 1.5 s at sf0.1. explode_outer + null-filter:
    * __toks is an ATTRIBUTE here, the explode filter-inlining trap
    * applies (see sourceOverlap). Shared by the vocab and
    * frequent-items tiers. */
  private def sourceShingles(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .select(col("source"), toks.as("__toks"))
      .select(col("source"),
        explode_outer(graft.ext.Dedup.shingles3(col("__toks"))).as("ng"))
      .filter(col("ng").isNotNull)

  def vocabBySource(spark: SparkSession, dir: String,
                    exact: Boolean): DataFrame = {
    val ng = sourceShingles(spark, dir)
    val vocab =
      if (exact) countDistinct(col("ng"))
      else approx_count_distinct(col("ng"), 0.02)
    ng.groupBy(col("source"))
      .agg(vocab.as("vocab"), count(lit(1)).as("ngrams"))
      .orderBy(col("source"))
  }

  /** The MATERIALIZED twin of the vocab tier: per-source HLL sketches
    * persisted once through IndexStore (`ext/SketchStore`), estimates
    * answered forever after by merging the stored kilobyte rows — no
    * corpus rescan. Build-if-absent at the shared index base (the
    * d9/y7 location pattern); delete the store dir to re-measure a
    * cold build. Timing twin (prodVariants): estimates, like the
    * transient _hll twin's — but the merge determinism and
    * append-without-rescan contracts are spec-pinned
    * (`SketchStoreSpec`). */
  def vocabSketchStore(spark: SparkSession, dir: String): DataFrame = {
    val path = graft.core.IndexStore.pathFor(spark, "vocab-sketch", dir)
    graft.ext.SketchStore.ingest(
      sourceShingles(spark, dir), "source", "ng", path, "base")
    graft.ext.SketchStore.estimate(spark, path)
  }

  /** Per-source top-k frequent shingles via `approx_top_k` — the
    * FREQUENT-ITEMS member of the sketch family (DataSketches
    * ItemsSketch, new in Spark 4.1), closing the set beside Bloom
    * membership, CMS frequency-screen, HLL cardinality, and GK
    * quantiles. What it buys over x_heavy_shingles' CMS screen: ONE
    * pass and one sketch-sized exchange end-to-end (the CMS pipeline
    * is screen + exact HAVING verify over the admitted slice), at the
    * price of estimates instead of exact counts. State is
    * maxTracked-bounded however large the corpus; the map-side
    * partials merge, so the exchange carries one sketch per (source,
    * partition). Timing twin only (prodVariants): top-k TIE order is
    * arbitrary and estimates have no hash-stable oracle —
    * `FrequentItemsSpec` pins the contract instead (exact counts and
    * full recall while distinct <= maxTracked; the heavy-item
    * never-miss guarantee under capacity pressure). */
  def heavyShinglesTopK(spark: SparkSession, dir: String, k: Int = 20,
                        maxTracked: Int = 8192): DataFrame =
    sourceShingles(spark, dir)
      .groupBy(col("source"))
      .agg(expr(s"approx_top_k(ng, $k, $maxTracked)").as("topk"))
      .select(col("source"), posexplode(col("topk")))
      .select(col("source"), col("pos").as("rank"),
        col("col.item").as("ng"), col("col.count").as("est_count"))

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_vocab_by_source" -> ((s: SparkSession, d: String) => vocabBySource(s, d)),
    "x_heavy_shingles"  -> ((s: SparkSession, d: String) => heavyShingles(s, d)),
    "x_curation_pipeline" -> (curationPipeline _),
    "x_text_stats"      -> (textStats _),
    "x_lang_id"         -> (langId _),
    "x_token_counts"    -> (tokenCounts _),
    "x_fingerprint"     -> (fingerprints _),
    "x_rolling_hash"    -> (rollingFingerprints _),
    "x_group_checksum"  -> (groupChecksum _),
    "x_multimodal_meta" -> (multimodalMeta _),
    "x_media_features"  -> (mediaFeatures _),
    "x_frame_sample"    -> (frameSample _),
    "x_frame_ann"       -> (frameAnn _),
    "x_resize_plan"     -> (resizePlanQ _),
    "x_hash_sample"     -> (hashSample _),
    "x_pii_scrub"       -> (piiScrub _),
    "x_decontaminate"   -> (decontaminate _),
    "x_stratified_sample" -> (stratifiedSample _),
    "x_repetition"      -> (repetition _),
    "x_gopher_rules"    -> (gopherRules _),
    "x_tfidf_topk"      -> (tfidfTopK _),
    "x_pack_sequences"  -> ((s, d) => packSequences(s, d)),
    "x_mixture_weights" -> (mixtureWeights _),
    "x_source_overlap"  -> (sourceOverlap _),
    "x_curate_pack"     -> ((s: SparkSession, d: String) => curatePack(s, d)),
    // the composable Curation API with its dials turned: quality-argmax
    // representatives (d13's rule) AND the recall-preserving salt-split
    // skew treatment in the candidate stage — the salt guard is
    // output-invariant, so the oracle needs no skew mirror, and the
    // best-representative survivor CTE is d13's verbatim
    "x_curate_best"     -> ((s: SparkSession, d: String) =>
      graft.ext.Curation.curate(Tables(s, d).documents,
        graft.ext.CurationConfig(representative = "best",
          skewMode = "salt", maxBucket = 2))),
    "x_rare_tokens"     -> (rareTokenScore _),
    "x_balanced_sample" -> (balancedSample _),
    "x_pack_shuffled"   -> ((s: SparkSession, d: String) => packShuffled(s, d)),
    "x_chunk_docs"      -> ((s: SparkSession, d: String) => chunkDocs(s, d)),
    "x_lm_score"        -> (lmScore _),
    "x_bloom_decontaminate" -> (bloomDecontaminate _),
    "x_corpus_report"   -> (corpusReport _),
    "x_quality_classifier" ->
      ((s: SparkSession, d: String) => qualityClassifier(s, d))
  )

  /** The x_lm_score CTE chain ending in `lmq(doc_id, n_bigrams,
    * lm_score)` — the ONE SQL-side definition of the per-doc bigram LM
    * score, shared by the x_lm_score oracle and SelectionQueries'
    * perplexity-bucket oracle (which re-ranks the same scores). */
  private[queries] val lmCte: String =
    s"""WITH t AS (
       |  SELECT doc_id, $toksSql AS toks FROM documents
       |), bg AS (
       |  SELECT doc_id, unnest(list_transform(range(1, len(toks)),
       |    i -> struct_pack(w1 := toks[i], w2 := toks[i + 1]))) AS p
       |  FROM t
       |), docbg AS (
       |  SELECT doc_id, p.w1 AS w1, p.w2 AS w2, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM bg GROUP BY 1, 2, 3
       |), cb AS (
       |  SELECT w1, w2, CAST(SUM(c) AS BIGINT) AS cb FROM docbg GROUP BY 1, 2
       |), cu AS (
       |  SELECT w1, CAST(SUM(cb) AS BIGINT) AS cu FROM cb GROUP BY 1
       |), b AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS nb FROM cb
       |), q AS (
       |  SELECT d.doc_id, d.c,
       |    CAST(floor(CAST(cb.cb + 1 AS DOUBLE) / CAST(cu.cu + b.nb AS DOUBLE)
       |      * 1000000000000.0 + 0.5) AS BIGINT) AS pq
       |  FROM docbg d
       |  JOIN cb ON d.w1 = cb.w1 AND d.w2 = cb.w2
       |  JOIN cu ON d.w1 = cu.w1
       |  CROSS JOIN b
       |), lmq AS (
       |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
       |    CAST(CAST(SUM(c * pq) AS BIGINT) AS DOUBLE)
       |      / (CAST(CAST(SUM(c) AS BIGINT) AS DOUBLE) * 1000000000000.0) AS lm_score
       |  FROM q GROUP BY doc_id
       |)""".stripMargin

  /** Bloom bit position `j` from a STAGED md5 hex column `hx` — SQL
    * valid on Spark AND DuckDB (hexValSql), m = 2^18. Position j is
    * the 5-hex slice [5j+1, 5j+5] of ONE digest per n-gram (mirrors
    * [[graft.ext.Bloom.posFromMd5Stage]]); the staging CTE computes
    * md5(ng) once so the oracle pays one digest per probe too. */
  private def bloomPosSql(j: Int, hx: String): String =
    s"(${graft.ext.Dedup.hexValSql(s"substr($hx, ${5 * j + 1}, 5)", 5)} % ${1 << 18})"

  def oracles: Map[String, String] = Map(
    // exact distinct only — the HLL twin is timing-only by design
    // (approximate output has no hash-stable oracle). RAW 3-gram
    // occurrences (no per-doc list_distinct — unlike shSql): the
    // ngrams column counts corpus mass, matching the Spark side.
    "x_vocab_by_source" ->
      s"""SELECT source, CAST(COUNT(DISTINCT ng) AS BIGINT) AS vocab,
         |  COUNT(*) AS ngrams
         |FROM (SELECT source,
         |  unnest(list_transform(range(1, greatest(len($toksSql) - 1, 1)),
         |    i -> $toksSql[i] || ' ' || $toksSql[i+1] || ' ' || $toksSql[i+2])) AS ng
         |  FROM documents)
         |GROUP BY source ORDER BY source""".stripMargin,
    // no CMS in the oracle: the sketch screen is complete-recall by
    // construction (estimates never undercount) and the exact pass
    // removes its false positives, so the answer IS the plain HAVING —
    // hash-sharing it is the cross-engine proof
    "x_heavy_shingles" ->
      s"""WITH occ AS (
         |  SELECT doc_id, unnest(${DedupQueries.shSql}) AS ng FROM documents
         |)
         |SELECT ng, CAST(COUNT(*) AS BIGINT) AS df FROM occ
         |GROUP BY ng
         |HAVING COUNT(*) >= CEIL(0.01 * (SELECT COUNT(*) FROM documents))
         |ORDER BY ng""".stripMargin,
    "x_curation_pipeline" -> {
      val p = TA.langProfiles
      def score(ws: Seq[String]) =
        s"CAST(len(list_filter($toksSql, t -> t IN (${sqlIn(ws)}))) AS BIGINT)"
      val quality = qualitySql
      s"""WITH canonical AS (
         |  SELECT doc_id, text FROM (
         |    SELECT doc_id, text,
         |      MIN(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id
         |    FROM documents) WHERE doc_id = canonical_id
         |), scored AS (
         |  SELECT doc_id, $quality AS quality,
         |    CAST(len($toksSql) AS BIGINT) AS n_tokens,
         |    ${score(p("en"))} AS s_en, ${score(p("de"))} AS s_de,
         |    ${score(p("fr"))} AS s_fr, ${score(p("es"))} AS s_es
         |  FROM canonical
         |)
         |SELECT doc_id, quality, n_tokens,
         |  CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
         |       WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
         |       WHEN s_fr >= s_es THEN 'fr'
         |       ELSE 'es' END AS pred_lang
         |FROM scored
         |WHERE quality >= 0.5 AND n_tokens BETWEEN 20 AND 200
         |ORDER BY doc_id""".stripMargin
    },
    "x_text_stats" ->
      s"""SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         |  CAST(len($toksSql) AS BIGINT) AS n_tokens,
         |  CAST(len(list_filter($toksSql, t -> t IN (${sqlIn(graft.ops.TextOps.stopWords)}))) AS DOUBLE)
         |    / greatest(CAST(len($toksSql) AS DOUBLE), 1.0) AS stopword_ratio,
         |  CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE)
         |    / greatest(CAST(length(text) AS DOUBLE), 1.0) AS punct_ratio,
         |  $qualitySql AS quality
         |FROM documents ORDER BY doc_id""".stripMargin,
    "x_lang_id" -> {
      val p = TA.langProfiles
      def score(ws: Seq[String]) =
        s"CAST(len(list_filter($toksSql, t -> t IN (${sqlIn(ws)}))) AS BIGINT)"
      s"""SELECT doc_id, lang AS labeled_lang,
         |  ${score(p("en"))} AS s_en, ${score(p("de"))} AS s_de,
         |  ${score(p("fr"))} AS s_fr, ${score(p("es"))} AS s_es,
         |  CASE WHEN ${score(p("en"))} >= ${score(p("de"))} AND ${score(p("en"))} >= ${score(p("fr"))} AND ${score(p("en"))} >= ${score(p("es"))} THEN 'en'
         |       WHEN ${score(p("de"))} >= ${score(p("fr"))} AND ${score(p("de"))} >= ${score(p("es"))} THEN 'de'
         |       WHEN ${score(p("fr"))} >= ${score(p("es"))} THEN 'fr'
         |       ELSE 'es' END AS pred_lang
         |FROM documents ORDER BY doc_id""".stripMargin
    },
    "x_token_counts" ->
      s"""SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS ws_tokens,
         |  CAST(len(regexp_extract_all(text, '${TA.bpeTokenRegex}')) AS BIGINT) AS bpe_tokens
         |FROM documents ORDER BY doc_id""".stripMargin,
    // aggregate SUMs cast back to BIGINT (DuckDB widens to HUGEINT);
    // int * double multiplies keep DuckDB's implicit int->double cast
    // explicit on the Spark side so both engines do the same two ops
    // d8's survivors (recursive-CTE connected components) -> token gate
    // -> per-shard packing, composed exactly like the Spark DAG
    "x_curate_pack" ->
      s"""${DedupQueries.survCte(s",\n    CAST(len($toksSql) AS BIGINT) AS n_tok")}, kept AS (
         |  SELECT doc_id, n_merged, n_tok, doc_id % 8 AS shard FROM surv
         |  WHERE n_tok BETWEEN 20 AND 2000
         |), c AS (
         |  SELECT doc_id, shard, n_tok, n_merged,
         |    CAST(SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id) AS BIGINT) AS cum
         |  FROM kept
         |)
         |SELECT doc_id, shard, n_tok, n_merged, (cum - n_tok) // 4096 AS seq_id
         |FROM c ORDER BY doc_id""".stripMargin,
    // the Curation API at (representative=best, skewMode=salt): d13's
    // best-survivor CTE -> the same token gate and per-shard packing as
    // x_curate_pack. The salt-split candidate stage is output-INVARIANT
    // (see d3_neardup_salted), so the SQL carries no skew mirror — the
    // armed Spark pipeline hash-matching this unguarded oracle IS the
    // cross-engine recall-preservation proof for the composed pipeline.
    "x_curate_best" ->
      s"""${DedupQueries.bestCte}, surv AS (
         |  SELECT d.doc_id, CAST(COALESCE(b.n_members, 1) AS BIGINT) AS n_merged,
         |    CAST(len($toksSql) AS BIGINT) AS n_tok
         |  FROM documents d
         |  LEFT JOIN labels l ON l.doc_id = d.doc_id
         |  LEFT JOIN best b ON b.best_id = d.doc_id
         |  WHERE l.doc_id IS NULL OR b.best_id IS NOT NULL
         |), kept AS (
         |  SELECT doc_id, n_merged, n_tok, doc_id % 8 AS shard FROM surv
         |  WHERE n_tok BETWEEN 20 AND 2000
         |), c AS (
         |  SELECT doc_id, shard, n_tok, n_merged,
         |    CAST(SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id) AS BIGINT) AS cum
         |  FROM kept
         |)
         |SELECT doc_id, shard, n_tok, n_merged, (cum - n_tok) // 4096 AS seq_id
         |FROM c ORDER BY doc_id""".stripMargin,
    "x_rare_tokens" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest($toksSql) AS tok FROM documents
         |), freq AS (
         |  SELECT tok, COUNT(*) AS cf FROM tok GROUP BY tok
         |), scored AS (
         |  SELECT t.doc_id, COUNT(*) AS n_tok,
         |    CAST(SUM(CASE WHEN f.cf < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare
         |  FROM tok t JOIN freq f ON t.tok = f.tok
         |  GROUP BY t.doc_id
         |)
         |SELECT doc_id, n_tok, n_rare,
         |  CAST(n_rare AS DOUBLE) / CAST(n_tok AS DOUBLE) AS rare_ratio
         |FROM scored ORDER BY doc_id""".stripMargin,
    "x_source_overlap" ->
      s"""WITH sh AS (
         |  SELECT d.source, unnest(${DedupQueries.shSql}) AS shingle
         |  FROM documents d
         |), ss AS (
         |  SELECT DISTINCT shingle, source FROM sh
         |)
         |SELECT a.source AS source_a, b.source AS source_b,
         |  COUNT(*) AS n_shared_shingles
         |FROM ss a JOIN ss b ON a.shingle = b.shingle AND a.source < b.source
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "x_mixture_weights" ->
      s"""WITH per AS (
         |  SELECT source, COUNT(*) AS n_docs,
         |    CAST(SUM(CAST(len($toksSql) AS BIGINT)) AS BIGINT) AS n_tokens
         |  FROM documents GROUP BY source
         |), tot AS (
         |  SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
         |    COUNT(*) AS n_sources
         |  FROM per
         |)
         |SELECT source, n_docs, n_tokens,
         |  CAST(n_tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE) AS token_share,
         |  CAST(total_tokens AS DOUBLE) /
         |    (CAST(n_sources AS DOUBLE) * CAST(n_tokens AS DOUBLE)) AS weight
         |FROM per, tot ORDER BY source""".stripMargin,
    "x_balanced_sample" -> {
      val v = graft.ext.Dedup.hexValSql("substr(md5(CAST(doc_id AS VARCHAR)),1,8)", 8)
      s"""WITH per AS (
         |  SELECT source,
         |    CAST(SUM(CAST(len($toksSql) AS BIGINT)) AS BIGINT) AS n_tokens
         |  FROM documents GROUP BY source
         |), tot AS (
         |  SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
         |    COUNT(*) AS n_sources
         |  FROM per
         |), rates AS (
         |  SELECT source,
         |    least(1.0, 0.5 * (CAST(total_tokens AS DOUBLE) /
         |      (CAST(n_sources AS DOUBLE) * CAST(n_tokens AS DOUBLE)))) AS rate
         |  FROM per, tot
         |)
         |SELECT doc_id, d.source, CAST($v % 1000000 AS BIGINT) AS bucket, rate
         |FROM documents d JOIN rates r ON r.source = d.source
         |WHERE CAST($v % 1000000 AS DOUBLE) < rate * 1000000.0
         |ORDER BY doc_id""".stripMargin
    },
    "x_pack_shuffled" ->
      s"""WITH t AS (
         |  SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS n_tok,
         |         doc_id % 8 AS shard,
         |         md5('seed42_' || CAST(doc_id AS VARCHAR)) AS ord
         |  FROM documents
         |), c AS (
         |  SELECT doc_id, shard, n_tok,
         |    CAST(SUM(n_tok) OVER (PARTITION BY shard ORDER BY ord, doc_id)
         |      AS BIGINT) AS cum
         |  FROM t
         |)
         |SELECT doc_id, shard, n_tok, (cum - n_tok) // 4096 AS seq_id
         |FROM c ORDER BY doc_id""".stripMargin,
    // window SUM cast back to BIGINT (DuckDB widens to HUGEINT)
    "x_pack_sequences" ->
      s"""WITH t AS (
         |  SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS n_tok,
         |         doc_id % 8 AS shard
         |  FROM documents
         |), c AS (
         |  SELECT doc_id, shard, n_tok,
         |    CAST(SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id) AS BIGINT) AS cum
         |  FROM t
         |)
         |SELECT doc_id, shard, n_tok, (cum - n_tok) // 4096 AS seq_id
         |FROM c ORDER BY doc_id""".stripMargin,
    "x_fingerprint" ->
      s"""SELECT doc_id,
         |  md5(array_to_string(list_sort(list_distinct($toksSql)), ' ')) AS fingerprint
         |FROM documents ORDER BY doc_id""".stripMargin,
    "x_rolling_hash" ->
      """WITH b AS (
        |  SELECT doc_id, hex(encode(text)) AS hx,
        |         octet_length(encode(text)) AS n
        |  FROM documents
        |), folded AS (
        |  SELECT doc_id,
        |    list_reduce(
        |      [CAST(0 AS HUGEINT)] ||
        |      list_transform(range(1, n + 1), i ->
        |        CAST((strpos('0123456789ABCDEF', substr(hx, 2*i-1, 1)) - 1) * 16
        |           + (strpos('0123456789ABCDEF', substr(hx, 2*i, 1)) - 1) AS HUGEINT)),
        |      (acc, x) -> (acc * 31 + x) % CAST('18446744073709551616' AS HUGEINT)) AS h
        |  FROM b
        |)
        |SELECT doc_id, CAST(CASE WHEN h >= CAST('9223372036854775808' AS HUGEINT)
        |  THEN h - CAST('18446744073709551616' AS HUGEINT) ELSE h END AS BIGINT) AS rhash
        |FROM folded ORDER BY doc_id""".stripMargin,
    "x_group_checksum" ->
      """WITH b AS (
        |  SELECT doc_id, lang, source, hex(encode(text)) AS hx,
        |         octet_length(encode(text)) AS n
        |  FROM documents
        |), folded AS (
        |  SELECT lang, source,
        |    list_reduce(
        |      [CAST(0 AS HUGEINT)] ||
        |      list_transform(range(1, n + 1), i ->
        |        CAST((strpos('0123456789ABCDEF', substr(hx, 2*i-1, 1)) - 1) * 16
        |           + (strpos('0123456789ABCDEF', substr(hx, 2*i, 1)) - 1) AS HUGEINT)),
        |      (acc, x) -> (acc * 31 + x) % CAST('18446744073709551616' AS HUGEINT)) AS h
        |  FROM b
        |), odd AS (
        |  SELECT lang, source, h - (h % 2) + 1 AS u FROM folded
        |), grp AS (
        |  -- 64x64-bit modular multiply via 32-bit limbs: a*x mod 2^64 =
        |  -- a0*x0 + ((a1*x0 + a0*x1) mod 2^32)*2^32  (mod 2^64); every
        |  -- intermediate < 2^65, so the signed INT128 HUGEINT never
        |  -- overflows (a direct a*x of two ~2^64 factors would)
        |  SELECT lang, source,
        |    list_reduce([CAST(1 AS HUGEINT)] || list(u),
        |      (a, x) -> ((a % 4294967296) * (x % 4294967296)
        |        + (((a // 4294967296) * (x % 4294967296)
        |           + (a % 4294967296) * (x // 4294967296)) % 4294967296)
        |          * 4294967296)
        |        % CAST('18446744073709551616' AS HUGEINT)) AS c,
        |    COUNT(*) AS n_docs
        |  FROM odd GROUP BY lang, source
        |)
        |SELECT lang, source, CAST(CASE WHEN c >= CAST('9223372036854775808' AS HUGEINT)
        |  THEN c - CAST('18446744073709551616' AS HUGEINT) ELSE c END AS BIGINT) AS checksum,
        |  n_docs
        |FROM grp ORDER BY lang, source""".stripMargin,
    "x_hash_sample" -> {
      val v = graft.ext.Dedup.hexValSql("substr(md5(CAST(doc_id AS VARCHAR)),1,8)", 8)
      s"""SELECT doc_id, bucket FROM (
         |  SELECT doc_id, $v % 100 AS bucket FROM documents
         |) WHERE bucket < 10 ORDER BY doc_id""".stripMargin
    },
    "x_pii_scrub" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(text, '[0-9]{6,}')) AS BIGINT) AS n_longnums,
        |  regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '[0-9]{6,}', '<NUM>', 'g') AS scrubbed
        |FROM documents ORDER BY doc_id""".stripMargin,
    "x_decontaminate" -> {
      val b = graft.ext.Dedup.hexValSql("substr(md5(CAST(doc_id AS VARCHAR)),1,8)", 8)
      s"""WITH sh AS (
         |  SELECT doc_id, ${DedupQueries.shSql} AS sh, $b % 100 AS b FROM documents
         |), ev AS (
         |  SELECT DISTINCT unnest(sh) AS ng FROM sh WHERE b < 5
         |), tr AS (
         |  SELECT doc_id, unnest(sh) AS ng FROM sh WHERE b >= 5
         |)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_contaminated
         |FROM tr JOIN ev USING (ng)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },
    "x_bloom_decontaminate" -> {
      val b = graft.ext.Dedup.hexValSql("substr(md5(CAST(doc_id AS VARCHAR)),1,8)", 8)
      s"""WITH sh AS (
         |  SELECT doc_id, ${DedupQueries.shSql} AS sh, $b % 100 AS b FROM documents
         |), ev AS (
         |  SELECT md5(ng) AS hx FROM (
         |    SELECT DISTINCT unnest(sh) AS ng FROM sh WHERE b < 5)
         |), pos AS (
         |  SELECT DISTINCT p FROM (
         |    SELECT unnest([${bloomPosSql(0, "hx")},
         |      ${bloomPosSql(1, "hx")}, ${bloomPosSql(2, "hx")}]) AS p FROM ev)
         |), tr AS (
         |  SELECT doc_id, md5(unnest(sh)) AS hx FROM sh WHERE b >= 5
         |), trh AS (
         |  SELECT doc_id, ${bloomPosSql(0, "hx")} AS h0,
         |    ${bloomPosSql(1, "hx")} AS h1, ${bloomPosSql(2, "hx")} AS h2
         |  FROM tr
         |)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_flagged
         |FROM trh
         |WHERE h0 IN (SELECT p FROM pos) AND h1 IN (SELECT p FROM pos)
         |  AND h2 IN (SELECT p FROM pos)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },
    "x_corpus_report" -> {
      val quality = qualitySql
      s"""WITH t AS (
         |  SELECT lang, source,
         |    CAST(octet_length(encode(text)) AS BIGINT) AS nb,
         |    CAST(len($toksSql) AS BIGINT) AS nt,
         |    CASE WHEN $quality >= 0.5 THEN 1 ELSE 0 END AS q
         |  FROM documents
         |)
         |SELECT CAST(GROUPING(lang) AS BIGINT) AS g_lang,
         |  CAST(GROUPING(source) AS BIGINT) AS g_source,
         |  lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(nt) AS BIGINT) AS n_tokens,
         |  CAST(SUM(nb) AS BIGINT) AS n_bytes,
         |  CAST(SUM(q) AS BIGINT) AS n_quality,
         |  CAST(SUM(q) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS quality_rate
         |FROM t GROUP BY CUBE (lang, source)
         |ORDER BY g_lang, g_source, lang, source""".stripMargin
    },
    "x_stratified_sample" -> {
      val b = graft.ext.Dedup.hexValSql("substr(md5(CAST(doc_id AS VARCHAR)),1,8)", 8)
      s"""SELECT doc_id, lang, bucket FROM (
         |  SELECT doc_id, lang, $b % 100 AS bucket FROM documents
         |) WHERE bucket < CASE lang WHEN 'en' THEN 10 WHEN 'de' THEN 25
         |                           WHEN 'fr' THEN 40 WHEN 'es' THEN 60 ELSE 5 END
         |ORDER BY doc_id""".stripMargin
    },
    "x_repetition" ->
      s"""WITH t AS (
         |  SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS n_tokens,
         |         unnest($toksSql) AS tok
         |  FROM documents
         |), c AS (
         |  SELECT doc_id, n_tokens, tok, COUNT(*) AS c FROM t GROUP BY 1, 2, 3
         |)
         |SELECT doc_id, n_tokens, CAST(COUNT(*) AS BIGINT) AS n_distinct,
         |  CAST(MAX(c) AS BIGINT) AS max_tok_count,
         |  CAST(COUNT(*) AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS distinct_ratio,
         |  CAST(MAX(c) AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS max_tok_share
         |FROM c GROUP BY doc_id, n_tokens ORDER BY doc_id""".stripMargin,
    // Gopher §A1.1 rules, same exact-int64-counts-through-one-division
    // arithmetic as the Spark side; lines split on chr(10)
    "x_gopher_rules" ->
      s"""WITH t AS (
         |  SELECT doc_id, $toksSql AS tk, string_split(text, chr(10)) AS ln
         |  FROM documents
         |), m AS (
         |  SELECT doc_id,
         |    CAST(len(tk) AS BIGINT) AS n_tokens,
         |    CAST(list_aggregate(list_transform(tk,
         |      x -> CAST(length(x) AS BIGINT)), 'sum') AS DOUBLE)
         |      / CAST(len(tk) AS DOUBLE) AS mean_tok_len,
         |    CAST(len(list_filter(tk, x -> regexp_matches(x, '[a-zA-Z]'))) AS DOUBLE)
         |      / CAST(len(tk) AS DOUBLE) AS alpha_tok_ratio,
         |    CAST(len(list_filter(ln, x -> regexp_matches(x, '^\\s*[-*•]'))) AS DOUBLE)
         |      / CAST(len(ln) AS DOUBLE) AS bullet_line_ratio,
         |    CAST(len(list_filter(ln, x -> regexp_matches(x, '(\\.\\.\\.|…)\\s*$$'))) AS DOUBLE)
         |      / CAST(len(ln) AS DOUBLE) AS ellipsis_line_ratio,
         |    CAST(len(ln) - len(list_distinct(ln)) AS DOUBLE)
         |      / CAST(len(ln) AS DOUBLE) AS dup_line_frac
         |  FROM t
         |)
         |SELECT m.*,
         |  (n_tokens >= 50 AND n_tokens <= 100000) AS r_word_count,
         |  (mean_tok_len >= 3.0 AND mean_tok_len <= 10.0) AS r_mean_len,
         |  (alpha_tok_ratio >= 0.8) AS r_alpha,
         |  (bullet_line_ratio <= 0.9) AS r_bullet,
         |  (ellipsis_line_ratio <= 0.3) AS r_ellipsis,
         |  (dup_line_frac <= 0.3) AS r_dup_lines,
         |  (n_tokens >= 50 AND n_tokens <= 100000
         |    AND mean_tok_len >= 3.0 AND mean_tok_len <= 10.0
         |    AND alpha_tok_ratio >= 0.8 AND bullet_line_ratio <= 0.9
         |    AND ellipsis_line_ratio <= 0.3 AND dup_line_frac <= 0.3) AS pass_gopher
         |FROM m ORDER BY doc_id""".stripMargin,
    "x_tfidf_topk" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest($toksSql) AS tok FROM documents
         |), tf AS (
         |  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2
         |), dfreq AS (
         |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1
         |), n AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents
         |), scored AS (
         |  SELECT doc_id, tf.tok AS tok, tf, df,
         |         tf * ((1000000 * n_docs) // df) AS score
         |  FROM tf JOIN dfreq USING (tok) CROSS JOIN n
         |)
         |SELECT doc_id, tok, tf, df, score FROM (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY doc_id ORDER BY score DESC, tok) AS rn
         |  FROM scored
         |) WHERE rn <= 3 ORDER BY doc_id, tok""".stripMargin,
    "x_chunk_docs" ->
      s"""WITH t AS (
         |  SELECT doc_id, $toksSql AS toks,
         |         CAST(len($toksSql) AS BIGINT) AS n
         |  FROM documents
         |), g AS (
         |  SELECT doc_id, toks, unnest(range(0, (n + 47) // 48)) AS chunk_id
         |  FROM t
         |), s AS (
         |  SELECT doc_id, chunk_id,
         |         list_slice(toks, chunk_id * 48 + 1, chunk_id * 48 + 64) AS ck
         |  FROM g
         |)
         |SELECT doc_id, chunk_id, CAST(len(ck) AS BIGINT) AS n_chunk_tokens,
         |       array_to_string(ck, ' ') AS chunk_text
         |FROM s ORDER BY doc_id, chunk_id""".stripMargin,
    "x_lm_score" ->
      s"""$lmCte
         |SELECT doc_id, n_bigrams, lm_score FROM lmq ORDER BY doc_id""".stripMargin,
    "x_multimodal_meta" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |  substr(hex(encode(text)), 1, 16) AS header_hex,
        |  CAST(octet_length(encode(text)) % 640 AS INTEGER) AS width,
        |  CAST((octet_length(encode(text)) * 7) % 480 AS INTEGER) AS height,
        |  CAST(octet_length(encode(text)) % 30 + 1 AS INTEGER) AS frames
        |FROM documents ORDER BY doc_id""".stripMargin,
    // byte-offset featurizer: ascii(char at floor(n*j/8)) == the byte
    // (corpus is pure ASCII — verified; the Spark side reads the BYTE)
    "x_media_features" -> {
      val d = graft.ext.Multimodal.FeatureDims
      val dims = (0 until d).map { j =>
        s"ascii(substr(text, CAST((octet_length(encode(text))*$j)//$d AS INT)+1, 1))/255.0 AS f$j"
      }.mkString(",\n  ")
      s"""SELECT doc_id,
         |  $dims
         |FROM documents ORDER BY doc_id""".stripMargin
    },
    "x_frame_sample" ->
      """WITH base AS (
        |  SELECT doc_id, text,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n,
        |    CAST(octet_length(encode(text)) % 30 + 1 AS BIGINT) AS frames
        |  FROM documents
        |)
        |SELECT doc_id, CAST(f AS INTEGER) AS frame_idx,
        |  CAST((n*(f+1))//frames - (n*f)//frames AS BIGINT) AS frame_len,
        |  md5(substr(text, CAST((n*f)//frames AS INT)+1,
        |             CAST((n*(f+1))//frames - (n*f)//frames AS INT))) AS frame_md5
        |FROM base, UNNEST(range(0, frames, 3)) AS t(f)
        |ORDER BY doc_id, frame_idx""".stripMargin,
    // frame slicing + byte-offset featurizer + exact snapped cosine,
    // all relational: component j of a frame = the byte at
    // frameStart + (frameLen*j)//dims, snapped at 1e-6 like every
    // similarity oracle; probes are the doc_id < 4 clips' frames
    "x_frame_ann" -> {
      val d = graft.ext.Multimodal.FeatureDims
      val comps = (0 until d).map { j =>
        s"""    CASE WHEN len = 0 THEN CAST(0 AS BIGINT)
           |    ELSE CAST(floor(ascii(substr(text,
           |      CAST(s + (len*$j)//$d AS INT) + 1, 1))
           |      /255.0 * 1000000 + 0.5) AS BIGINT) END""".stripMargin
      }.mkString(",\n")
      s"""WITH base AS (
         |  SELECT doc_id, text,
         |    CAST(octet_length(encode(text)) AS BIGINT) AS n,
         |    CAST(octet_length(encode(text)) % 30 + 1 AS BIGINT) AS frames
         |  FROM documents
         |), fr AS (
         |  SELECT doc_id, CAST(f AS INTEGER) AS frame_idx, text,
         |    (n*f)//frames AS s,
         |    (n*(f+1))//frames - (n*f)//frames AS len
         |  FROM base, UNNEST(range(0, frames, 3)) AS t(f)
         |), feat AS (
         |  SELECT doc_id, frame_idx, [
         |$comps
         |  ] AS sv FROM fr
         |), nrm AS (
         |  SELECT doc_id, frame_idx, sv,
         |    sqrt(CAST(CAST(list_aggregate(list_transform(sv, x -> x*x),
         |      'sum') AS BIGINT) AS DOUBLE)) AS nn
         |  FROM feat
         |), probes AS (
         |  SELECT doc_id AS p_doc, frame_idx AS p_frame, sv AS pv, nn AS pn
         |  FROM nrm WHERE doc_id < 4
         |), scored AS (
         |  SELECT p.p_doc, p.p_frame, q.doc_id AS n_doc,
         |    q.frame_idx AS n_frame,
         |    CAST(CAST(list_aggregate(list_transform(list_zip(p.pv, q.sv),
         |      z -> z[1]*z[2]), 'sum') AS BIGINT) AS DOUBLE) / (p.pn * q.nn) AS cos
         |  FROM probes p, nrm q WHERE q.doc_id <> p.p_doc
         |), ranked AS (
         |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY p_doc, p_frame
         |    ORDER BY cos DESC, n_doc, n_frame) AS BIGINT) AS rank
         |  FROM scored
         |)
         |SELECT p_doc, p_frame, n_doc, n_frame, rank, cos FROM ranked
         |WHERE rank <= 5 ORDER BY p_doc, p_frame, rank""".stripMargin
    },
    "x_resize_plan" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CAST(octet_length(encode(text)) % 640 AS INTEGER) AS width,
        |    CAST((octet_length(encode(text)) * 7) % 480 AS INTEGER) AS height
        |  FROM documents
        |), s AS (
        |  SELECT doc_id, width, height,
        |    least(256, (64*256)//greatest(width, 1),
        |               (64*256)//greatest(height, 1)) AS scale_256
        |  FROM m
        |)
        |SELECT doc_id, width, height,
        |  CAST((width*scale_256)//256 AS INTEGER) AS out_w,
        |  CAST((height*scale_256)//256 AS INTEGER) AS out_h
        |FROM s ORDER BY doc_id""".stripMargin,
    // hashed-feature linear classifier: weight(t) = hex16(md5 t) - 32768,
    // int64 sum, rational squash (exp-sigmoid isn't cross-engine exact)
    "x_quality_classifier" -> {
      val hv = graft.ext.Dedup.hex4ValSql("h")
      s"""WITH feat AS (
         |  SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS n_tokens,
         |    CAST(list_sum(list_transform(
         |      list_transform($toksSql, t -> substr(md5(t), 1, 4)),
         |      h -> $hv - 32768)) AS BIGINT) AS raw
         |  FROM documents
         |), m AS (
         |  SELECT doc_id, n_tokens, raw,
         |    CAST(raw AS DOUBLE) / (CAST(n_tokens AS DOUBLE) * 32768.0) AS mm
         |  FROM feat
         |)
         |SELECT doc_id, n_tokens, raw,
         |  0.5 + 0.5 * mm / (1.0 + abs(mm)) AS score
         |FROM m ORDER BY doc_id""".stripMargin
    }
  )
}
