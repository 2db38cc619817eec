package graft.ext

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Keyed upsert/merge onto a parquet table — the materialization half
  * of the CDC story. The reference's change-detection job (ref:
  * TradeChangeDetectionJob.java — mirrored by `jobs/Jobs.scala` and
  * `t4_change_rows`) EMITS a change stream; the thing a user does
  * next is apply that stream to a queryable table. Plain parquet has
  * no MERGE, so the table is laid out for selective rewrite:
  *
  *   `<path>/bucket=<i>/` with i = pmod(xxhash64(key), n) — each
  *   bucket an independently committed dir ([[graft.core.IndexStore]]
  *   marker-last protocol), plus a `_graft_upsert_spec` manifest
  *   (bucket count + key + ordering, so a later writer can't silently
  *   hash with a drifted spec — the BucketedWarehouse manifest
  *   lesson).
  *
  * [[applyChanges]] then touches ONLY the buckets the change keys
  * hash into: read touched buckets + changes → latest-row-per-key
  * merge (one partial-aggregable `max_by`, no skew amplification on
  * hot keys) → ONE staging job partitioned by bucket → per-bucket
  * atomic swap (metadata renames). Cost scales with
  * |changes| + |touched buckets' data|, never with the table — on a
  * 100 TB table sized at ~4k buckets, a change batch touching 40
  * buckets rewrites ~1% of the data; the other 99% is never read,
  * never written, byte-identical after (spec-pinned).
  *
  * Consistency unit: a KEY lives entirely in one bucket, so readers
  * always see per-key-consistent state; cross-key atomicity across a
  * multi-bucket apply is NOT provided (a crash mid-apply leaves some
  * buckets new, some old — each internally consistent, and a retried
  * apply of the same change batch converges: the merge is
  * idempotent). Deletes are change rows whose `op` column is "D",
  * and the winning tombstone is PERSISTED (an `op` column in the
  * stored rows, filtered at read) — without that, a late-arriving
  * update ordered BEFORE the delete would merge against nothing and
  * silently resurrect the key (the first cut had exactly this bug;
  * the spec's revive case caught it). A tombstone row costs a few
  * bytes per deleted key until [[compactTombstones]] drops tombstones
  * older than every possible straggler — the Hudi/Delta retention
  * trade, keyed here to the caller's ordering columns.
  *
  * This is deliberately NOT [[graft.core.BucketedWarehouse]]: there a
  * bucket is a catalog JOIN unit (shuffle-free co-located joins);
  * here it is a REWRITE unit (partition dir + own commit marker). A
  * table needing both would bucketBy inside each partition dir.
  *
  * Two write modes, the Hudi COW/MOR split:
  *  - COPY-ON-WRITE ([[applyChanges]], above): each apply rewrites
  *    the touched buckets. Reads stay a plain scan; writes pay
  *    |touched buckets' data| per batch — wrong for a 1 s trigger
  *    appending a handful of rows, which would rewrite the same hot
  *    buckets every second.
  *  - MERGE-ON-READ ([[appendChanges]]): a change batch lands as its
  *    own committed `delta=<id>` dir — write cost O(|batch|), base
  *    untouched. [[readTable]] then merges base + deltas per key at
  *    read (one extra aggregation), and [[compactDeltas]] folds the
  *    accumulated deltas into the base (one COW apply of the
  *    cross-delta winners), restoring scan-speed reads. Delta ids
  *    break ordering ties — base < delta, lower id < higher — and
  *    the compaction preserves that order, so a reader before and
  *    after a compact sees the identical table (spec-pinned).
  *    Streaming appends pass the micro-batch id as the delta id:
  *    a committed delta=<id> makes crash-replays exactly-once, the
  *    StreamSink batch-dir shape.
  *
  * The delta timeline doubles as history: [[readTableAsOf]] serves
  * the table as of any UNCOMPACTED delta id (the fold is destructive,
  * so [[compactDeltas]] publishes a [[compactionHorizon]] floor and
  * older snapshots fail loud rather than lie), and [[changeFeed]]
  * serves the net per-key change across a delta range at delta-dir
  * cost — the incremental-consumer read. [[vacuum]] reclaims
  * crash-orphaned scratch/staging dirs under a grace period.
  *
  * Schema evolution: a change batch may ADD columns (they surface as
  * null on pre-evolution rows — reads merge footers and union by
  * name) or OMIT columns an old writer never knew (stored as null).
  * Replacement is whole-row CDC semantics, never a per-column patch:
  * the winning row's absent columns are null, not inherited from the
  * row it replaced. The key and ordering columns are the spec's and
  * cannot evolve.
  */
object Upsert {

  private val SpecFile = "_graft_upsert_spec"
  private val SpecVersion = "2"
  private val HorizonFile = "_graft_upsert_horizon"

  final case class Spec(n: Int, keyCol: String, keyType: String,
                        orderCols: Seq[String])

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  /** Bucket of a key. The key is CAST to the table's manifest-pinned
    * key type before hashing: xxhash64 hashes an INT's 4 bytes and a
    * BIGINT's 8 differently, so a change batch carrying the same key
    * VALUES at a narrower type would otherwise route rows to the
    * wrong bucket with no error (union coercion hides it) — silent
    * hash drift, the exact failure class the manifest exists to
    * block. */
  private def bucketOf(spec: Spec): Column =
    pmod(xxhash64(col(spec.keyCol).cast(spec.keyType)), lit(spec.n)).cast("int")

  /** Latest row per key by (orderCols, priority): `max_by` over a
    * lexicographic struct — partial-merge-friendly, so a hot key
    * costs one row per partition on the wire, not its history. */
  private def latest(rows: DataFrame, spec: Spec, dataCols: Seq[String]): DataFrame = {
    val ord = struct((spec.orderCols :+ "_pri").map(col): _*)
    rows.groupBy(col(spec.keyCol))
      .agg(max_by(struct(dataCols.map(col): _*), ord).as("_w"))
      .select(col("_w.*"))
  }

  private def writeSpec(spark: SparkSession, path: String, spec: Spec): Unit = {
    val f = fs(spark, new Path(path))
    f.mkdirs(new Path(path))
    // temp-then-rename: a torn manifest can never be read back
    val tmp = new Path(path, s".$SpecFile-" + java.util.UUID.randomUUID().toString.take(8))
    val out = f.create(tmp, true)
    out.write((s"$SpecVersion|${spec.n}|${spec.keyCol}|${spec.keyType}|" +
      spec.orderCols.mkString(",")).getBytes("UTF-8"))
    out.close()
    val target = new Path(path, SpecFile)
    if (f.exists(target)) f.delete(target, false)
    if (!f.rename(tmp, target)) {
      f.delete(tmp, false)
      throw new IllegalStateException(s"could not publish upsert spec at $path")
    }
  }

  /** Highest delta id ever folded into the base by [[compactDeltas]],
    * or -1 if nothing was ever folded. Snapshots at or below a folded
    * id are unreconstructable (the fold is destructive by design), so
    * [[readTableAsOf]] and [[changeFeed]] refuse them LOUD instead of
    * silently serving the post-fold state as if it were the old
    * snapshot. */
  def compactionHorizon(spark: SparkSession, path: String): Long = {
    val f = fs(spark, new Path(path))
    val hf = new Path(path, HorizonFile)
    if (!f.exists(hf)) return -1L
    val in = f.open(hf)
    val raw = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
              finally in.close()
    scala.util.Try(raw.toLong).getOrElse(throw new IllegalStateException(
      s"unparseable compaction horizon at $hf ('$raw') — " +
        "the snapshot floor is unknown; rebuild with Upsert.init"))
  }

  private def writeHorizon(spark: SparkSession, path: String, id: Long): Unit = {
    val f = fs(spark, new Path(path))
    // temp-then-rename, the spec file's publish rule: a torn horizon
    // would otherwise read back as a parse error on every snapshot call
    val tmp = new Path(path, s".$HorizonFile-" + java.util.UUID.randomUUID().toString.take(8))
    val out = f.create(tmp, true)
    out.write(id.toString.getBytes("UTF-8"))
    out.close()
    val target = new Path(path, HorizonFile)
    if (f.exists(target)) f.delete(target, false)
    if (!f.rename(tmp, target)) {
      f.delete(tmp, false)
      throw new IllegalStateException(s"could not publish compaction horizon at $path")
    }
  }

  /** True iff `path` carries an upsert-table manifest — the cheap
    * dispatch probe for readers that accept either a plain parquet
    * artifact or an upsert table at the same parameter (the streaming
    * label maintainer's two publish modes). One fs.exists, no parse. */
  def isTable(spark: SparkSession, path: String): Boolean =
    fs(spark, new Path(path)).exists(new Path(path, SpecFile))

  def readSpec(spark: SparkSession, path: String): Spec = {
    val f = fs(spark, new Path(path))
    val sf = new Path(path, SpecFile)
    require(f.exists(sf),
      s"no upsert table at $path — create one with Upsert.init")
    val in = f.open(sf)
    val raw = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
              finally in.close()
    raw.split('|') match {
      case Array(SpecVersion, n, key, kt, ord)
          if scala.util.Try(n.toInt).isSuccess =>
        Spec(n.toInt, key, kt, ord.split(',').toSeq)
      case _ => throw new IllegalStateException(
        s"unparseable upsert spec at $sf ('$raw') — rebuild with Upsert.init")
    }
  }

  /** Create (or reset) the table at `path` from `rows`: latest row
    * per key, hashed into `n` bucket dirs. One staging job + n
    * atomic swaps; the manifest is published LAST, so a crashed init
    * is an unreadable table (loud), never a half-table. */
  def init(rows: DataFrame, path: String, keyCol: String,
           orderCols: Seq[String], n: Int): Unit = {
    require(n >= 1 && n <= 4096, s"bucket count must be in [1,4096], got $n")
    val spark = rows.sparkSession
    val spec = Spec(n, keyCol,
      rows.schema(keyCol).dataType.catalogString, orderCols)
    val dataCols = rows.columns.toSeq
    Seq("bucket", "_pri", "op").foreach(r => require(!dataCols.contains(r),
      s"'$r' is reserved by Upsert"))
    val live = latest(rows.withColumn("_pri", lit(0)), spec, dataCols)
      .withColumn("op", lit("U"))
      .withColumn("bucket", bucketOf(spec))
    stageAndSwap(spark, path, live, (0 until n), dataCols :+ "op", spec)
    // "(or reset)" must mean it: a re-init with a SMALLER bucket count
    // would otherwise leave buckets >= n committed — and readRaw's
    // bucket=\d+ listing (unbounded by the spec) would serve their
    // stale rows forever, unreachable by any future applyChanges hash
    val f = fs(spark, new Path(path))
    val bucketDir = "bucket=(\\d+)".r
    val deltaDir = "(\\.delta-build-.*|delta=\\d+(\\.build-.*)?)".r
    f.listStatus(new Path(path)).toSeq
      .flatMap(s => s.getPath.getName match {
        case bucketDir(i) if s.isDirectory && i.toInt >= n => Some(s.getPath)
        // a reset must also clear pending merge-on-read deltas — left
        // committed, they would merge straight over the fresh base —
        // and any in-flight hidden delta scratch
        case d if s.isDirectory && deltaDir.pattern.matcher(d).matches() =>
          Some(s.getPath)
        case _ => None
      })
      .foreach(p => f.delete(p, true))
    // a reset table has no fold history: clear the snapshot floor
    f.delete(new Path(path, HorizonFile), false)
    writeSpec(spark, path, spec)
  }

  /** Apply one change batch: `changes` carries the table's data
    * columns plus `opCol` ("U" upsert / "D" delete). Only the buckets
    * the change keys hash into are read or rewritten; winning
    * tombstones are stored (see the class doc's revive note).
    *
    * REFUSED while merge-on-read deltas are pending (the same guard
    * [[rescale]] applies): the merged read ranks base at _src=0 and
    * deltas above it, so a COW write under standing deltas is SHADOWED
    * by any delta row on ordering ties — and the write mutates the
    * base without moving the compaction horizon, so a still-allowed
    * [[readTableAsOf]] would silently serve post-snapshot state as
    * history. Fold the deltas first ([[compactDeltas]]) or stay in
    * one write mode per table epoch. */
  def applyChanges(spark: SparkSession, path: String, changes: DataFrame,
                   opCol: String = "op"): Unit = {
    require(deltas(spark, path).isEmpty,
      s"applyChanges at $path with pending merge-on-read deltas would be " +
        "shadowed by delta rows on ordering ties and would corrupt asOf " +
        "snapshots - run compactDeltas first (COW and MOR writes do not mix)")
    applyChangesUnchecked(spark, path, changes, opCol)
  }

  /** [[compactDeltas]]' entry: the fold itself runs while the delta
    * dirs still exist (they are removed after), which is exactly the
    * state the public guard refuses. package-private so the crash-window
    * spec (UpsertMorSpec) can induce fold-done-deletes-pending by hand. */
  private[graft] def applyChangesUnchecked(spark: SparkSession, path: String,
                                           changes: DataFrame,
                                           opCol: String = "op"): Unit = {
    val spec = readSpec(spark, path)
    // persisted: the batch feeds TWO actions (bucket discovery, then
    // the staging write), and a nondeterministic source recomputed
    // between them could route rows to buckets outside the discovered
    // set — which the swap loop would then silently discard
    val chg = changes.withColumnRenamed(opCol, "op")
      .withColumn("bucket", bucketOf(spec))
      .persist()
    try {
      // NULL keys are refused LOUD, by an explicit probe: xxhash64(NULL)
      // is NOT null (HashExpression is nullable=false — a null input
      // leaves the seed untouched), so a null key would silently hash
      // to a real bucket and merge as a phantom group. The first cut
      // here checked the collected bucket list for nulls — dead code
      // for exactly that reason (review r11).
      require(chg.filter(col(spec.keyCol).isNull).isEmpty,
        s"change batch for $path carries NULL values in key column " +
          s"'${spec.keyCol}' - null keys are refused rather than merged " +
          "as a phantom hash group")
      // bounded driver collect: at most n bucket ids (n <= 4096)
      val touched = chg.select("bucket").distinct()
        .collect().map(_.getInt(0)).sorted
      if (touched.isEmpty) return
      val f = fs(spark, new Path(path))
      val existing = touched.map(i => s"$path/bucket=$i")
        .filter(d => f.exists(new Path(d, "_SUCCESS")))
      val current =
        if (existing.isEmpty) chg.limit(0)
        else spark.read.option("mergeSchema", "true")
          .option("basePath", path).parquet(existing: _*)
      // schema evolution: the union is BY NAME with missing columns
      // null-filled, so an evolved batch (new column) upgrades the
      // touched buckets in place and an old-writer batch (missing
      // column) stores null there — replacement is whole-row CDC
      // semantics, never a per-column patch (spec-pinned)
      val all = current.withColumn("_pri", lit(0))
        .unionByName(chg.withColumn("_pri", lit(1)),
          allowMissingColumns = true)
      val dataCols = all.columns.toSeq
        .filterNot(Seq("_pri", "bucket", "op").contains)
      val win = latest(all, spec, dataCols :+ "op" :+ "bucket")
      stageAndSwap(spark, path, win, touched.toSeq, dataCols :+ "op", spec)
    } finally chg.unpersist(false)
  }

  /** Append one change batch as a committed `delta=<id>` dir — the
    * merge-on-read write path: O(|batch|), the base untouched.
    * `deltaId` is the idempotence key (pass the micro-batch id from
    * streaming; a committed id makes a replay a no-op); omitted, the
    * next free id is taken, retrying past ids a concurrent appender
    * claims first (a lost ensure race must allocate a NEW id, never
    * silently drop the batch under the winner's). Returns the id
    * written (or found committed). */
  def appendChanges(spark: SparkSession, path: String, changes: DataFrame,
                    opCol: String = "op",
                    deltaId: Option[Long] = None): Long = {
    val spec = readSpec(spark, path)
    val chg = changes.withColumnRenamed(opCol, "op")
      .withColumn("bucket", bucketOf(spec))
      .persist() // one logical batch even if the commit below retries
    try {
      // same null-key contract as applyChanges, enforced at WRITE time:
      // a null key stored in a delta would merge as a phantom hash
      // group in every later read/fold (xxhash64(NULL) is non-null).
      // One limit-1 probe on the cached batch.
      require(chg.filter(col(spec.keyCol).isNull).isEmpty,
        s"change batch for $path carries NULL values in key column " +
          s"'${spec.keyCol}' - null keys are refused rather than merged " +
          "as a phantom hash group")
      // Deltas get their own commit instead of IndexStore.ensure, for
      // one reason: ensure's scratch is the VISIBLE sibling
      // `delta=<id>.build-*`, which a `delta=*` glob consumer
      // ([[graft.streaming.StreamUpsert.feed]]) would list mid-build —
      // and worse, re-list under its committed name after the rename
      // (a double read). A DOT-prefixed scratch is invisible to
      // Spark's hidden-path filter, and the publish is one atomic dir
      // rename with the parquet committer's own _SUCCESS already
      // inside — a glob consumer sees a delta either not at all or
      // complete. Race semantics match ensure: the loser's rename
      // fails (or lands as a hidden stray inside the winner, removed
      // here), and tryWrite reports "found committed".
      def tryWrite(id: Long): Boolean = {
        val target = new Path(s"$path/delta=$id")
        val f = fs(spark, target)
        if (graft.core.IndexStore.isCommitted(spark, target.toString)) return false
        val scratch = new Path(path,
          ".delta-build-" + java.util.UUID.randomUUID().toString.take(8))
        try {
          chg.write.mode("overwrite").parquet(scratch.toString)
          if (!f.rename(scratch, target)) return false // lost the race
          val stray = new Path(target, scratch.getName)
          if (f.exists(stray)) { // posix rename-INTO: racer committed first
            f.delete(stray, true); return false
          }
          true
        } finally {
          if (f.exists(scratch)) f.delete(scratch, true)
        }
      }
      val horizon = compactionHorizon(spark, path)
      deltaId match {
        case Some(id) =>
          // an id at or below the horizon WAS committed and then
          // folded — a streaming crash-replay arriving after a compact
          // must stay a no-op (the fold already consumed this batch),
          // not mint a fresh delta under a consumed id
          if (id > horizon) tryWrite(id)
          id
        case None =>
          // allocation restarts ABOVE the horizon: compaction deletes
          // the dirs, and a recycled id would be invisible to
          // readTableAsOf/changeFeed guards that treat folded ids as
          // history
          var id = math.max(horizon + 1,
            deltas(spark, path).lastOption.map(_ + 1).getOrElse(0L))
          var tries = 0
          while (!tryWrite(id)) {
            id += 1; tries += 1
            require(tries < 100,
              s"could not allocate a delta id at $path after 100 attempts")
          }
          id
      }
    } finally chg.unpersist(false)
  }

  /** Committed delta ids, ascending. */
  def deltas(spark: SparkSession, path: String): Seq[Long] = {
    val root = new Path(path)
    val f = fs(spark, root)
    if (!f.exists(root)) return Seq.empty
    val deltaDir = "delta=(\\d+)".r
    f.listStatus(root).toSeq.flatMap(s => s.getPath.getName match {
      case deltaDir(id) if s.isDirectory &&
          f.exists(new Path(s.getPath, "_SUCCESS")) => Some(id.toLong)
      case _ => None
    }).sorted
  }

  /** Fold every committed delta into the base (one COW apply of the
    * cross-delta winners — delta order preserved as the ordering
    * tiebreak, so the merged base equals what [[readTable]] showed
    * before the fold), then drop the delta dirs. Crash-safe by
    * convergence: a crash after the apply but before the deletes
    * leaves deltas that re-merge to the identical table, and a
    * re-compact converges. Returns the number of deltas folded. */
  def compactDeltas(spark: SparkSession, path: String): Int = {
    val spec = readSpec(spark, path)
    val ids = deltas(spark, path)
    if (ids.isEmpty) return 0
    // horizon FIRST: once the fold starts, snapshots at or below
    // max(ids) stop being reconstructable, and the floor must already
    // say so if we crash mid-fold (a crash after the fold with the old
    // floor would let readTableAsOf serve a base that silently carries
    // future deltas' effects). A crash after this write but before the
    // fold only over-restricts — the deltas still re-merge correctly
    // and a re-compact converges.
    writeHorizon(spark, path, ids.max)
    val (dRows, cols) = readDeltas(spark, path, ids)
    // cross-delta winner per key, ties by delta id (later wins) —
    // the same rule the reader applies
    val winners = dRows
      .withColumn("_pri", col("_src"))
      .groupBy(col(spec.keyCol))
      .agg(max_by(struct(cols.map(col): _*),
        struct((spec.orderCols :+ "_pri").map(col): _*)).as("_w"))
      .select(col("_w.*"))
    applyChangesUnchecked(spark, path, winners, "op")
    val f = fs(spark, new Path(path))
    ids.foreach(id => f.delete(new Path(s"$path/delta=$id"), true))
    spark.catalog.refreshByPath(path)
    ids.size
  }

  /** All delta rows with `_src` = delta id + 1 (0 is the base's
    * rank), plus the column list (dataCols incl. op) they carry. */
  private def readDeltas(spark: SparkSession, path: String,
                         ids: Seq[Long]): (DataFrame, Seq[String]) = {
    val df = spark.read.option("mergeSchema", "true")
      .option("basePath", path)
      .parquet(ids.map(id => s"$path/delta=$id"): _*)
      .withColumn("_src", col("delta").cast("long") + 1L)
      .drop("delta")
    (df, df.columns.filterNot(c => c == "_src" || c == "bucket").toSeq)
  }

  /** Every committed LIVE row (torn dirs and tombstones invisible),
    * data columns only. With no deltas this is a plain scan of the
    * base buckets (the COW fast path — t6's oracle-checked plan);
    * with deltas present it is the merge-on-read view: base rank 0
    * and each delta at rank id+1 feed the same latest-per-key
    * `max_by` the writers use, so read-after-append equals
    * read-after-compact row for row. */
  def readTable(spark: SparkSession, path: String): DataFrame =
    mergedView(spark, path, deltas(spark, path))

  /** Snapshot read: the table as it stood after delta `asOf` was
    * applied — base plus committed deltas with id <= asOf (asOf = -1
    * is the base alone). The snapshot window is the UNCOMPACTED delta
    * range: [[compactDeltas]] destroys the per-delta history it folds,
    * so ids at or below [[compactionHorizon]] are refused loud. With
    * streaming appends keyed by micro-batch id, this is "the table as
    * of micro-batch N" — the replay/debug read the CDC story needs,
    * priced at exactly the deltas it includes. The same straggler
    * trade as [[compactTombstones]] applies: a snapshot cannot see a
    * tombstone that compaction already dropped. */
  def readTableAsOf(spark: SparkSession, path: String, asOf: Long): DataFrame = {
    val horizon = compactionHorizon(spark, path)
    require(asOf >= horizon,
      s"snapshot at delta $asOf is unreconstructable: deltas up to $horizon " +
        s"were compacted into the base at $path (the fold is destructive; " +
        "retain snapshots by compacting less eagerly)")
    mergedView(spark, path, deltas(spark, path).filter(_ <= asOf))
  }

  /** Net change per key across the committed deltas in
    * (sinceExclusive, untilInclusive] — the incremental-consumer read:
    * "what changed since my last read at delta N", with the winning
    * `op` still attached ("U" upsert / "D" delete) so a downstream
    * materialization can apply it directly. Cost is the delta dirs in
    * range, never the base — the whole point of reading the feed
    * instead of diffing two snapshots. Ids at or below the compaction
    * horizon are refused loud (their per-delta history is folded away);
    * an empty range returns an empty frame with the table's change
    * schema. */
  def changeFeed(spark: SparkSession, path: String,
                 sinceExclusive: Long, untilInclusive: Long): DataFrame = {
    val spec = readSpec(spark, path)
    require(untilInclusive >= sinceExclusive,
      s"empty-by-construction feed range ($sinceExclusive, $untilInclusive]")
    val horizon = compactionHorizon(spark, path)
    require(sinceExclusive >= horizon,
      s"change feed since delta $sinceExclusive is unreconstructable: deltas " +
        s"up to $horizon were compacted into the base at $path")
    val ids = deltas(spark, path)
      .filter(id => id > sinceExclusive && id <= untilInclusive)
    if (ids.isEmpty)
      return readRaw(spark, path).drop("bucket").limit(0)
    val (dRows, cols) = readDeltas(spark, path, ids)
    dRows
      .withColumn("_pri", col("_src"))
      .groupBy(col(spec.keyCol))
      .agg(max_by(struct(cols.map(col): _*),
        struct((spec.orderCols :+ "_pri").map(col): _*)).as("_w"))
      .select(col("_w.*"))
  }

  /** The shared latest-per-key merge over base + the given delta ids;
    * with no deltas it degenerates to the plain bucket scan (the COW
    * fast path every oracle run exercises). */
  private def mergedView(spark: SparkSession, path: String,
                         ids: Seq[Long]): DataFrame = {
    val spec = readSpec(spark, path)
    if (ids.isEmpty)
      return readRaw(spark, path).filter(col("op") =!= "D").drop("op", "bucket")
    val (dRows, _) = readDeltas(spark, path, ids)
    val base = readRaw(spark, path).withColumn("_src", lit(0L))
    // by-name union with null-fill: an evolved delta's new column
    // surfaces with nulls on pre-evolution rows (schema evolution)
    val all = base.unionByName(dRows, allowMissingColumns = true)
    val cols = all.columns.toSeq
      .filterNot(c => c == "_src" || c == "bucket")
    val merged = all
      .withColumn("_pri", col("_src"))
      .groupBy(col(spec.keyCol))
      .agg(max_by(struct(cols.map(col): _*),
        struct((spec.orderCols :+ "_pri").map(col): _*)).as("_w"))
      .select(col("_w.*"))
    merged.filter(col("op") =!= "D").drop("op")
  }

  /** Remove crash-orphaned work dirs around the table: `*.build-*`
    * scratches (a killed [[graft.core.IndexStore]] replace on a
    * bucket dir), hidden `.delta-build-*` scratches (a killed
    * [[appendChanges]]), `<table>.stage-*` staging dirs (a killed
    * [[applyChanges]] before its finally) and `*.stale-*` asides (a
    * killed `IndexStore.ensure` between renaming a marker-less
    * partial aside and deleting it — by construction an UNCOMMITTED
    * partial, unlike `.old-*`) older than `graceMs`. The
    * grace period is what makes this safe to run beside live writers —
    * a scratch younger than the longest plausible write is left alone.
    * `.old-*` aside dirs are NEVER touched: replace preserves one only
    * when it is the sole surviving copy of the data (see
    * IndexStore.replace's crash-recovery note) — reclaiming those is a
    * human decision. Returns the number of dirs removed. */
  def vacuum(spark: SparkSession, path: String,
             graceMs: Long = 24L * 3600 * 1000): Long = {
    readSpec(spark, path) // a vacuum target must be an upsert table
    val root = new Path(path)
    val f = fs(spark, root)
    val cutoff = System.currentTimeMillis() - graceMs
    val orphan = "(\\.delta-build-[0-9a-f]{8}|.*\\.(build|stage|stale)-[0-9a-f]{8})".r
    def sweep(dir: Path, prefix: String): Long =
      if (!f.exists(dir)) 0L
      else f.listStatus(dir).toSeq.count { s =>
        val name = s.getPath.getName
        val isOrphan = s.isDirectory && name.startsWith(prefix) &&
          orphan.pattern.matcher(name).matches() &&
          s.getModificationTime < cutoff
        if (isOrphan) f.delete(s.getPath, true)
        isOrphan
      }.toLong
    // inside the root: bucket=i.build-*, delta=id.build-*
    val inRoot = sweep(root, "")
    // siblings of the root: <table>.stage-* (applyChanges staging) and
    // <table>.build-* (a killed ensure over the table dir itself)
    val beside = Option(root.getParent)
      .map(sweep(_, root.getName + ".")).getOrElse(0L)
    inRoot + beside
  }

  /** Drop persisted tombstones matching `expired` (a predicate over
    * the stored columns — typically "ordering timestamp older than
    * every possible straggler", e.g. `col("ts") < lit(horizon)`).
    * Rewrites every bucket that holds an expired tombstone, leaves
    * the rest untouched. The documented trade: a straggler update
    * ordered before a COMPACTED-AWAY delete will resurrect its key —
    * that is what the horizon must bound. Returns the number of
    * tombstones dropped. */
  def compactTombstones(spark: SparkSession, path: String,
                        expired: Column): Long = {
    val spec = readSpec(spark, path)
    val raw = readRaw(spark, path)
    val dead = raw.filter(col("op") === "D" && expired)
    // bounded driver collect: bucket ids only (n <= 4096)
    val touched = dead.select("bucket").distinct()
      .collect().map(_.getInt(0)).sorted
    if (touched.isEmpty) return 0L
    val nDead = dead.count()
    val keep = raw
      .filter(touched.map(i => col("bucket") === i).reduce(_ || _))
      // NULL-safe: a tombstone whose expiry predicate is NULL is NOT
      // expired (three-valued logic would otherwise drop it from the
      // rewrite silently — destroying an unexpired tombstone and
      // re-opening the resurrection window without it ever appearing
      // in the returned count)
      .filter(!(col("op") === "D" && coalesce(expired, lit(false))))
    val dataCols = raw.columns.filterNot(c => c == "bucket").toSeq
    stageAndSwap(spark, path, keep, touched.toSeq, dataCols, spec)
    nDead
  }

  /** Re-hash the table into `newN` buckets — the capacity move a
    * grown table needs (a 16-bucket table at 100× its design size has
    * 100× the intended rewrite unit; the operating rule in BASELINE
    * is ≳1 GB/bucket). One staging job re-partitions EVERY stored row
    * — live and tombstone alike (an init-shaped rebuild from
    * readTable would silently drop tombstones and re-open the
    * late-straggler resurrection window) — then per-bucket swaps and
    * a LAST-published spec rewrite, so a crash mid-rescale leaves the
    * old spec describing the old (still committed, still complete)
    * bucket set: every key still routes and reads consistently, and
    * the rescale is re-runnable. Pending deltas must be compacted
    * first (their rows carry old-spec bucket ids; folding them across
    * a hash change would mis-route). Old dirs beyond the new count
    * are removed after the spec flips. */
  def rescale(spark: SparkSession, path: String, newN: Int): Unit = {
    require(newN >= 1 && newN <= 4096, s"bucket count must be in [1,4096], got $newN")
    val spec = readSpec(spark, path)
    if (spec.n == newN) return
    require(deltas(spark, path).isEmpty,
      s"rescale at $path with pending deltas would mis-route their " +
        "stored bucket ids - run compactDeltas first")
    // Rescale is an OFFLINE move: an applyChanges overlapping the swap
    // would rename old-hash bucket contents into the new generation —
    // rows present twice, silently. A live apply announces itself by
    // its `<table>.stage-*` staging dir; refuse while one exists. (A
    // writer that read the old spec but has not yet staged slips this
    // check — quiesce writers for the rescale window, the same
    // contract as any offline re-bucketing.)
    val rootP = new Path(path)
    val fsr = fs(spark, rootP)
    val liveStage = Option(rootP.getParent).toSeq
      .flatMap(par => fsr.listStatus(par).toSeq)
      .map(_.getPath.getName)
      .filter(n => n.startsWith(rootP.getName + ".stage-"))
    require(liveStage.isEmpty,
      s"rescale at $path while a change apply is staging (${liveStage.head}) " +
        "- quiesce writers first (or vacuum if it is a crash orphan)")
    val newSpec = spec.copy(n = newN)
    val horizon = compactionHorizon(spark, path)
    val rows = readRaw(spark, path).drop("bucket")
    // WHY a whole-root generation swap and not per-bucket swaps: with
    // the hash changing under the rows, a crash between per-bucket
    // swaps leaves a mix of old-hash and new-hash dirs that
    // readRaw's list-everything union reads as duplicates AND losses.
    // IndexStore.replace builds the complete new generation beside the
    // table and publishes it by one root rename (aside-preserved on a
    // failed swap), so readers see the old table, the new table, or a
    // loud miss - never a blend.
    graft.core.IndexStore.replace(spark, path) { scratch =>
      rows.withColumn("bucket", bucketOf(newSpec))
        .write.partitionBy("bucket").mode("overwrite").parquet(scratch)
      val f = fs(spark, new Path(scratch))
      // readRaw's contract: every live bucket dir carries its own
      // marker; hash-empty buckets still get a committed empty dir
      (0 until newN).foreach { i =>
        val d = new Path(scratch, s"bucket=$i")
        f.mkdirs(d)
        val m = new Path(d, "_SUCCESS")
        if (!f.exists(m)) f.create(m, false).close()
      }
      writeSpec(spark, scratch, newSpec)
      // the horizon survives the rescale: resetting it would let
      // appendChanges recycle folded ids - a replay double-apply
      if (horizon >= 0) writeHorizon(spark, scratch, horizon)
      // replace's commit contract: the scratch publishes marker-last
      val rootM = new Path(scratch, "_SUCCESS")
      if (!f.exists(rootM)) f.create(rootM, false).close()
    }
    require(readSpec(spark, path).n == newN,
      s"rescale at $path published but the spec does not read back at $newN")
  }

  /** As stored: live rows AND persisted tombstones, with `op` and
    * `bucket` — the maintenance/compaction view. */
  def readRaw(spark: SparkSession, path: String): DataFrame = {
    val root = new Path(path)
    readSpec(spark, path) // spec must exist and parse (loud otherwise)
    val f = fs(spark, root)
    val bucketDir = "bucket=\\d+".r
    val committed = f.listStatus(root).toSeq
      .filter(s => s.isDirectory &&
        bucketDir.pattern.matcher(s.getPath.getName).matches() &&
        f.exists(new Path(s.getPath, "_SUCCESS")))
      .map(_.getPath.toString)
    require(committed.nonEmpty, s"upsert table at $path has no committed buckets")
    // mergeSchema: after a schema evolution only the touched buckets
    // carry the new column — a sampled-footer schema would silently
    // DROP it from reads of the others; the merged footer union costs
    // one planning-time footer pass, parallel across files
    spark.read.option("mergeSchema", "true")
      .option("basePath", path).parquet(committed: _*)
  }

  /** One staging write of `live` (already carrying its `bucket`
    * column) partitioned by bucket, then an atomic per-bucket swap by
    * metadata rename — the only Spark job is the staging write. A
    * touched bucket with no staged dir (every key deleted) swaps to a
    * committed zero-row dir so stale rows can't survive. */
  private def stageAndSwap(spark: SparkSession, path: String, live: DataFrame,
                           buckets: Seq[Int], dataCols: Seq[String],
                           spec: Spec): Unit = {
    val f = fs(spark, new Path(path))
    val stage = s"$path.stage-" + java.util.UUID.randomUUID().toString.take(8)
    try {
      live.select(("bucket" +: dataCols).map(col): _*)
        .write.partitionBy("bucket").mode("overwrite").parquet(stage)
      buckets.foreach { i =>
        val staged = new Path(s"$stage/bucket=$i")
        graft.core.IndexStore.replace(spark, s"$path/bucket=$i") { scratch =>
          val sp = new Path(scratch)
          f.mkdirs(sp)
          if (f.exists(staged))
            f.listStatus(staged).filterNot(_.getPath.getName.startsWith("_"))
              .foreach { st =>
                if (!f.rename(st.getPath, new Path(sp, st.getPath.getName)))
                  throw new IllegalStateException(
                    s"could not stage ${st.getPath} into $scratch")
              }
          else
            // empty bucket: zero-row file keeps the dir self-describing
            live.limit(0).drop("bucket")
              .write.mode("overwrite").parquet(scratch)
          if (!f.exists(new Path(sp, "_SUCCESS")))
            f.create(new Path(sp, "_SUCCESS"), false).close()
        }
      }
    } finally {
      f.delete(new Path(stage), true)
    }
    spark.catalog.refreshByPath(path)
  }
}
