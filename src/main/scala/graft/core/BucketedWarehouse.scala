package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Co-located join storage: persist a frame as a Spark BUCKETED table —
  * hash-bucketed AND sorted by the join key — so that every downstream
  * equi-join or aggregation on that key is satisfied by the table's
  * on-disk layout: no shuffle exchange, no sort, just a zip of matching
  * buckets. This is the storage-side half of shuffle elimination; the
  * plan-side half (AQE, broadcast) only helps when one side is small.
  * At 100 TB, where BOTH fact sides are huge and re-joined on the same
  * key query after query (lineitem⋈orders on orderkey every night), a
  * one-time bucketed write amortizes the shuffle across every future
  * join — the classic warehouse co-location contract (Hive bucketing,
  * Spark `bucketBy`).
  *
  * Sizing rule: pick `buckets` so one bucket of the LARGER table fits
  * an executor's shuffle memory (bucket ≈ table_bytes / buckets); at
  * 100 TB that is thousands of buckets, and the bucket count — like a
  * partition count — should be a power of two so a later `bucketBy(2k)`
  * re-write can split buckets without re-reading unrelated keys. Both
  * join sides MUST agree on the count: Spark zips bucket i with bucket
  * i, and mismatched counts fall back to a shuffle on the smaller side
  * (still half the exchange cost — one side stays put).
  *
  * Catalog mechanics: bucketing metadata lives in the session catalog,
  * not the parquet footers, so a fresh session must re-REGISTER the
  * table before the layout is trusted. [[ensure]] handles both halves:
  * data absent → bucketed write (external table at `location`, its
  * `_SUCCESS` marker is the committed signal, the [[IndexStore]]
  * convention); data committed but catalog entry missing (new session
  * over a warm store) → re-register the external-table DDL over the
  * existing bucketed files, no data movement. Spark's bucketed file
  * naming (`..._00042.c000...`) carries the bucket id, so a
  * re-registered table reads with full bucket trust. */
object BucketedWarehouse {

  /** Sidecar spec manifest, written next to the data at every write
    * path (`ensure` cold write, [[compact]] rewrite). The bucket spec
    * lives only in the session catalog, so a warm-store re-register
    * must re-declare it — and a re-declaration that differs from what
    * the files were written with makes bucket pruning hash against the
    * wrong modulus and silently drop matching rows. The manifest is the
    * written-with record the re-register path validates against. An
    * underscore-prefixed name so parquet scans ignore it. */
  private val SpecFile = "_graft_bucket_spec"

  private def hadoopFs(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  /** Persist the written-with spec next to the data. Called after the
    * data write commits: a crash in between leaves a committed store
    * without a manifest, which the re-register path treats as a
    * pre-manifest store (filename fallback), never as a mismatch. */
  private def writeSpec(spark: SparkSession, location: String,
                        buckets: Int, key: String): Unit = {
    val (fs, _) = hadoopFs(spark, location)
    // temp-file-then-rename: fs.create is not atomic, and a partial
    // manifest (crash mid-write on a non-atomic store) would read as
    // corrupt forever. The publish prefers FileContext's OVERWRITE
    // rename — a single atomic replace WHERE THE SCHEME PROVIDES IT
    // (HDFS overrides renameInternal(overwrite); the local
    // AbstractFileSystem inherits the default delete-then-rename, so
    // file:// still carries a tiny no-manifest window) — and falls
    // back to FileSystem delete+rename on schemes with no
    // AbstractFileSystem binding at all. Honest blast radius of the
    // residual window, both paths: a crash inside it leaves NO
    // manifest, which downgrades the NEXT re-registration to the
    // filename-count check ONCE — whose success immediately backfills
    // the manifest (validateWarmSpec) — never a torn/corrupt read.
    val tmp = new org.apache.hadoop.fs.Path(location,
      SpecFile + ".tmp-" + java.util.UUID.randomUUID().toString)
    val out = fs.create(tmp, true)
    try out.write(s"buckets=$buckets\nkey=$key\n".getBytes("UTF-8"))
    finally out.close()
    val f = new org.apache.hadoop.fs.Path(location, SpecFile)
    try {
      try {
        val fc = org.apache.hadoop.fs.FileContext.getFileContext(
          f.toUri, spark.sessionState.newHadoopConf())
        fc.rename(fc.makeQualified(tmp), fc.makeQualified(f),
          org.apache.hadoop.fs.Options.Rename.OVERWRITE)
      } catch {
        case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
          if (fs.exists(f)) fs.delete(f, false)
          if (!fs.rename(tmp, f)) throw new java.io.IOException(
            s"rename $tmp -> $f returned false")
      }
    } catch {
      case e: Exception =>
        fs.delete(tmp, false)
        throw new java.io.IOException(
          s"could not publish bucket spec manifest at $f", e)
    }
  }

  private def readSpec(spark: SparkSession,
                       location: String): Option[(Int, String)] = {
    val (fs, _) = hadoopFs(spark, location)
    val f = new org.apache.hadoop.fs.Path(location, SpecFile)
    if (!fs.exists(f)) None
    else {
      val in = fs.open(f)
      val text =
        try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
          "UTF-8")
        finally in.close()
      val kv = text.linesIterator.flatMap { line =>
        line.split("=", 2) match {
          case Array(k, v) => Some(k.trim -> v.trim)
          case _           => None
        }
      }.toMap
      // a manifest that EXISTS but doesn't parse is corruption (e.g. a
      // torn write on a store populated before the atomic-rename
      // publish), not a pre-manifest store — fail loud with the rebuild
      // hint instead of surfacing a bare NumberFormatException or,
      // worse, silently falling back to the weaker filename check
      val parsed = for (b <- kv.get("buckets");
                        n <- scala.util.Try(b.toInt).toOption;
                        k <- kv.get("key")) yield (n, k)
      if (parsed.isEmpty) throw new IllegalStateException(
        s"bucketed store at $location has an unreadable spec manifest " +
          s"($SpecFile content: ${text.take(80).replace("\n", "\\n")}) — " +
          "likely a torn write; delete the manifest to re-validate via " +
          "bucket filenames, or rebuild through BucketedWarehouse")
      parsed
    }
  }

  /** Validate a warm-store re-registration's declared spec against the
    * on-disk layout. Manifest present → exact match required. Manifest
    * absent (pre-manifest store) → fall back to the bucket ids encoded
    * in Spark's bucketed file names (`..._00042.c000...`): the declared
    * count must be exactly max-id+1. The fallback can false-reject a
    * store whose highest bucket is legitimately empty (no file) — that
    * fails loud with a rebuild hint, which is the right direction: the
    * alternative (accepting a wrong count) drops rows silently. The
    * key column is only checkable via the manifest. */
  private def validateWarmSpec(spark: SparkSession, location: String,
                               buckets: Int, key: String): Unit =
    readSpec(spark, location) match {
      case Some((b, k)) =>
        require(b == buckets && k == key,
          s"bucketed store at $location was written with buckets=$b " +
            s"key=$k but re-registration declared buckets=$buckets " +
            s"key=$key — a mismatched declared spec makes bucket " +
            "pruning silently drop rows; register with the written-with " +
            "spec or rebuild")
      case None =>
        val (fs, loc) = hadoopFs(spark, location)
        val BucketId = "_(\\d{5})\\.c\\d+".r
        val ids = fs.listStatus(loc).iterator
          .map(_.getPath.getName)
          .flatMap(n => BucketId.findFirstMatchIn(n).map(_.group(1).toInt))
          .toSeq
        require(ids.nonEmpty,
          s"bucketed store at $location has no spec manifest and no " +
            "bucket-id-named files — cannot validate the declared spec; " +
            "rebuild through BucketedWarehouse.ensure")
        val actual = ids.max + 1
        require(actual == buckets,
          s"bucketed store at $location has bucket ids implying " +
            s"$actual buckets but re-registration declared $buckets — " +
            "a mismatched declared spec makes bucket pruning silently " +
            "drop rows; register with the written-with count or rebuild " +
            "(if the highest bucket is legitimately empty, rebuild writes " +
            "the spec manifest and this check becomes exact)")
        // backfill: the filename fallback can only check the COUNT —
        // a drifted KEY on a manifest-less store would still register
        // silently, forever. Persisting the now-validated declared
        // spec makes the key checkable on every subsequent
        // re-registration instead of waiting for a compact. BEST
        // EFFORT, deliberately: registration was a read-only operation
        // before the manifest existed, and it must keep working for a
        // session with only read access to a shared warm store — and
        // for two sessions racing the backfill (either manifest wins;
        // both carry the same validated count, and the key becomes
        // checkable either way).
        try writeSpec(spark, location, buckets, key)
        catch {
          // a lost backfill only means the NEXT registration still
          // uses the filename fallback — registration itself succeeded
          case e: Exception => System.err.println(
            s"[graft] bucket-spec backfill at $location skipped: ${e.getMessage}")
        }
    }

  /** Ensure `name` is a registered bucketed table at `location`,
    * building it from `frame` only when no committed artifact exists.
    * Returns `name`, readable via `spark.table(name)`. The write path
    * is single-maintainer (the [[IndexStore.replace]] discipline):
    * concurrent first-callers of the same table should be serialized
    * by the caller's scheduler. */
  def ensure(spark: SparkSession, name: String, location: String,
             buckets: Int, key: String)(frame: => DataFrame): String = {
    require(buckets > 0, s"bucket count must be positive, got $buckets")
    if (!spark.catalog.tableExists(name)) {
      if (IndexStore.isCommitted(spark, location)) {
        // warm store, cold catalog: register the existing bucketed
        // files as an external table. Schema from the parquet footers;
        // bucket spec re-declared (it lives only in the catalog) —
        // validated against the written-with manifest first, because a
        // drifted declaration silently breaks bucket pruning.
        validateWarmSpec(spark, location, buckets, key)
        val ddlSchema = spark.read.parquet(location).schema.toDDL
        spark.sql(
          s"""CREATE TABLE $name ($ddlSchema)
             |USING PARQUET
             |CLUSTERED BY ($key) SORTED BY ($key) INTO $buckets BUCKETS
             |LOCATION '$location'""".stripMargin)
      } else {
        // repartition ON the bucket key first: Spark writes one file
        // per (task, bucket), so an unaligned upstream partitioning
        // yields up to tasks×buckets files and — decisively — MULTIPLE
        // files per bucket, which makes the reader distrust the sortBy
        // order and re-insert a Sort under every merge join. Aligned
        // (repartition's murmur3 hash is the bucket hash), each bucket
        // is exactly one sorted file: the scan reports both the
        // distribution AND the order, and joins skip the sort too.
        frame.repartition(buckets, org.apache.spark.sql.functions.col(key))
          .write.format("parquet")
          .bucketBy(buckets, key).sortBy(key)
          .option("path", location)
          .mode("overwrite")
          .saveAsTable(name)
        writeSpec(spark, location, buckets, key)
      }
    }
    name
  }

  /** Bucket count from the LARGER side's on-disk bytes: next power of
    * two of bytes/target, floored at `minBuckets`. The target is
    * compressed-parquet bytes per bucket — the quantity that decides
    * whether one bucket's join task fits an executor AND what the scan
    * parallelism ceiling is (a bucketed scan gets exactly one task per
    * bucket: an 8-bucket 60M-row table reads on 8 cores no matter how
    * wide the cluster is — the round-8 probe measured exactly that
    * before this sizing existed). Power of two so [[split]] can double
    * the count without re-reading unrelated keys. */
  def autoBuckets(spark: SparkSession, dataPath: String,
                  targetBytes: Long = 64L << 20, minBuckets: Int = 8): Int = {
    val p = new org.apache.hadoop.fs.Path(dataPath)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val bytes = fs.getContentSummary(p).getLength
    val want = math.max(minBuckets, math.ceil(bytes.toDouble / targetBytes).toInt)
    Integer.highestOneBit(want - 1) << 1 match {
      case 0 => minBuckets
      case b => math.max(b, minBuckets)
    }
  }

  /** Append a batch to a registered bucketed table, preserving the
    * bucket spec (count + key come from the catalog, so callers cannot
    * drift the layout). Each append lands one MORE file per touched
    * bucket: the join stays exchange-free (distribution still holds),
    * but sort trust is file-count-gated, so merge joins silently
    * re-sort buckets until the next [[compact]] — the same
    * append-degrades / compact-restores cadence as the near-dup and
    * ANN indexes ([[IndexStore]] maintenance parity). */
  def append(spark: SparkSession, name: String, frame: DataFrame): Unit = {
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(name))
    val spec = meta.bucketSpec.getOrElse(throw new IllegalArgumentException(
      s"$name is not a bucketed table"))
    val key = spec.bucketColumnNames.head
    frame.repartition(spec.numBuckets, org.apache.spark.sql.functions.col(key))
      .write.format("parquet")
      .bucketBy(spec.numBuckets, key).sortBy(key)
      .mode("append").saveAsTable(name)
  }

  /** Restore the one-sorted-file-per-bucket v2 layout after appends:
    * rewrite the table's data through [[IndexStore.replace]] (old files
    * readable throughout, crash can't leave the location torn), keeping
    * the SAME catalog entry and location — only the files swap. The
    * scratch write goes through a throwaway catalog name because
    * bucketed writes must flow through `saveAsTable`; the temp entry is
    * dropped before the swap (external table: catalog-only drop).
    * Single-maintainer, like every replace. */
  def compact(spark: SparkSession, name: String): Unit = {
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(name))
    val spec = meta.bucketSpec.getOrElse(throw new IllegalArgumentException(
      s"$name is not a bucketed table"))
    val key = spec.bucketColumnNames.head
    val loc = meta.location.toString
    IndexStore.replace(spark, loc) { scratch =>
      val tmp = name + "_compact_" +
        java.util.UUID.randomUUID().toString.take(8)
      // the temp catalog entry is dropped in a finally: a failed
      // scratch write would otherwise leave a dangling entry pointing
      // at a scratch path that replace's own finally block deletes
      try {
        // read the FILES, not the catalog table: a bucketed scan
        // advertises its (multi-file) layout to the planner, which then
        // re-plans the write's shuffle at spark.sql.shuffle.partitions
        // and fans buckets across tasks — the plain file read + aligned
        // repartition is exactly the shape the original ensure write
        // used, and it yields one file per bucket again
        spark.read.parquet(loc)
          .repartition(spec.numBuckets, org.apache.spark.sql.functions.col(key))
          .write.format("parquet")
          .bucketBy(spec.numBuckets, key).sortBy(key)
          .option("path", scratch)
          .saveAsTable(tmp)
        writeSpec(spark, scratch, spec.numBuckets, key)
      } finally spark.sql(s"DROP TABLE IF EXISTS $tmp")
    }
    spark.catalog.refreshTable(name)
  }

  /** The standard co-located fact pair for a testdata dir: lineitem and
    * orders bucketed+sorted on their order key, same bucket count
    * (auto-sized from the lineitem bytes when 0 — both sides MUST
    * agree, so the larger side picks). Table names and locations are
    * keyed by the dir digest (stable across sessions, collision-free
    * across scale factors AND bucket counts), base directory via
    * `spark.graft.bucket.dir` (any Hadoop-FS URI; driver-local tmpdir
    * is the standalone fallback).
    *
    * Session conf side effect, deliberate and documented: sort trust
    * for bucketed scans (`spark.sql.legacy.bucketedTableScan
    * .outputOrdering`) is enabled here — the writer's v2 layout
    * guarantees one sorted file per bucket, which is exactly the
    * precondition that conf exists for; without it every merge join
    * re-sorts each bucket in memory (measured: the per-bucket sort of
    * a 7.5M-row bucket dominated the sf10 join before this). It only
    * affects bucketed scans, which in this library exist only through
    * this warehouse. */
  def factPair(spark: SparkSession, dir: String,
               buckets: Int = 0): (String, String) = {
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    val n =
      if (buckets > 0) buckets
      else autoBuckets(spark, s"${dir.stripSuffix("/")}/lineitem.parquet")
    // layout epoch in the digest: bump when the on-disk contract
    // changes (v2 = one-sorted-file-per-bucket), so a warm store from
    // an older layout is never re-registered with trust it can't honor
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$dir#$n#v2".getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString.take(12)
    val base = spark.conf.get("spark.graft.bucket.dir",
      sys.props("java.io.tmpdir"))
    val root = s"${base.stripSuffix("/")}/graft-bucketed-$digest"
    val t = graft.sources.Tables(spark, dir)
    val li = ensure(spark, s"graft_bkt_lineitem_$digest",
      s"$root/lineitem", n, "l_orderkey")(t.lineitem)
    val ord = ensure(spark, s"graft_bkt_orders_$digest",
      s"$root/orders", n, "o_orderkey")(t.orders)
    (li, ord)
  }

  /** Double a bucketed table's bucket count WITHOUT a shuffle — the
    * payoff the power-of-two sizing rule ([[autoBuckets]], header
    * sizing note) was bought for. With Spark's bucket hash
    * (`pmod(murmur3(key), n)`), every key in old bucket `b` lands in
    * new bucket `b` or `b + n` under `2n` — each old bucket splits
    * into exactly two children and no key crosses to an unrelated
    * bucket. Mechanically: a BUCKETED scan of the table plans exactly
    * one task per old bucket (Spark groups files by bucket id, any
    * file count), so each write task holds precisely the rows of its
    * two child buckets — the bucketed writer emits one file per
    * (task, bucket) = one sorted file per child bucket, preserving the
    * v2 one-sorted-file-per-bucket layout, with zero exchange in the
    * plan (spec-pinned in `BucketedJoinSpec`). The rewrite flows
    * through [[IndexStore.replace]] (old files readable throughout, a
    * crash cannot tear the location) and re-registers the catalog
    * entry with the doubled count (bucket spec lives in the catalog,
    * so the old entry would silently mis-prune). Auto-bucketed-scan
    * is forced OFF for the read: if AQE rewrote the scan as a plain
    * file scan, a large bucket file could SPLIT across tasks
    * (maxPartitionBytes) and tear a child bucket across two files
    * from two tasks. Single-maintainer, like every replace. */
  def split(spark: SparkSession, name: String): Unit = {
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(name))
    val spec = meta.bucketSpec.getOrElse(throw new IllegalArgumentException(
      s"$name is not a bucketed table"))
    val key = spec.bucketColumnNames.head
    val loc = meta.location.toString
    val doubled = spec.numBuckets * 2
    // capture the bucketed scan BEFORE dropping the catalog entry: the
    // analyzed plan holds the resolved relation (files + bucket spec),
    // so the write below reads it fine with the entry gone
    val source = spark.table(name)
    // drop FIRST: between the data publish and the re-register the
    // catalog would otherwise declare the OLD count over doubled files
    // — a crash in that window would leave point filters pruning to
    // the wrong bucket and joins zipping mismatched buckets, silently.
    // Dropped-then-crashed instead fails LOUD: the table is simply
    // unregistered, and a re-ensure validates the declared count
    // against whichever manifest (n or 2n) the crash left committed.
    spark.sql(s"DROP TABLE IF EXISTS $name")
    def register(buckets: Int): Unit = {
      // the catalog schema is already in hand (no re-listing + footer
      // inference over the location)
      spark.sql(
        s"""CREATE TABLE $name (${meta.schema.toDDL})
           |USING PARQUET
           |CLUSTERED BY ($key) SORTED BY ($key) INTO $buckets BUCKETS
           |LOCATION '$loc'""".stripMargin)
      spark.catalog.refreshTable(name)
    }
    val autoScanKey = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prevAutoScan = spark.conf.getOption(autoScanKey)
    spark.conf.set(autoScanKey, "false")
    try {
      IndexStore.replace(spark, loc) { scratch =>
        val tmp = name + "_split_" +
          java.util.UUID.randomUUID().toString.take(8)
        try {
          // NO repartition: the bucketed scan's one-task-per-bucket
          // distribution IS the split's locality guarantee; the writer
          // inserts only a task-local sort on (bucket id, key)
          source
            .write.format("parquet")
            .bucketBy(doubled, key).sortBy(key)
            .option("path", scratch)
            .saveAsTable(tmp)
          writeSpec(spark, scratch, doubled, key)
        } finally spark.sql(s"DROP TABLE IF EXISTS $tmp")
      }
    } catch {
      // an ORDINARY failure (scratch disk full, task failure) aborts
      // replace with the old n-bucket data at loc fully intact — put
      // the catalog entry BACK so the table stays queryable, then
      // rethrow. Only a process CRASH leaves the table unregistered,
      // and that is the deliberate loud state the drop-first ordering
      // buys (a crashed catalog-window would otherwise mis-prune
      // silently); re-ensure re-registers against whichever manifest
      // the crash left committed.
      case e: Throwable =>
        try register(spec.numBuckets)
        catch { case re: Throwable => e.addSuppressed(re) }
        throw e
    } finally prevAutoScan match {
      case Some(v) => spark.conf.set(autoScanKey, v)
      case None    => spark.conf.unset(autoScanKey)
    }
    // re-register with the doubled spec
    register(doubled)
  }
}
