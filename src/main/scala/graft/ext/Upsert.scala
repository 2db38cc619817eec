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
  */
object Upsert {

  private val SpecFile = "_graft_upsert_spec"
  private val SpecVersion = "2"

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
    val deltaDir = "delta=\\d+(\\.build-.*)?".r
    f.listStatus(new Path(path)).toSeq
      .flatMap(s => s.getPath.getName match {
        case bucketDir(i) if s.isDirectory && i.toInt >= n => Some(s.getPath)
        // a reset must also clear pending merge-on-read deltas — left
        // committed, they would merge straight over the fresh base
        case d if s.isDirectory && deltaDir.pattern.matcher(d).matches() =>
          Some(s.getPath)
        case _ => None
      })
      .foreach(p => f.delete(p, true))
    writeSpec(spark, path, spec)
  }

  /** Apply one change batch: `changes` carries the table's data
    * columns plus `opCol` ("U" upsert / "D" delete). Only the buckets
    * the change keys hash into are read or rewritten; winning
    * tombstones are stored (see the class doc's revive note). */
  def applyChanges(spark: SparkSession, path: String, changes: DataFrame,
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
      // bounded driver collect: at most n bucket ids (n <= 4096)
      val touched = chg.select("bucket").distinct()
        .collect().map(_.getInt(0)).sorted
      if (touched.isEmpty) return
      val dataCols = changes.columns.filterNot(_ == opCol).toSeq
      val f = fs(spark, new Path(path))
      val existing = touched.map(i => s"$path/bucket=$i")
        .filter(d => f.exists(new Path(d, "_SUCCESS")))
      val current =
        if (existing.isEmpty) chg.limit(0)
        else spark.read.option("basePath", path).parquet(existing: _*)
      val all = current.withColumn("_pri", lit(0))
        .unionByName(chg.withColumn("_pri", lit(1)))
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
      .persist() // one logical batch even if the ensure below retries
    try {
      def tryWrite(id: Long): Boolean = {
        val target = s"$path/delta=$id"
        if (graft.core.IndexStore.isCommitted(spark, target)) return false
        var built = false
        graft.core.IndexStore.ensure(spark, target) { scratch =>
          chg.write.mode("overwrite").parquet(scratch)
          built = true
        }
        built
      }
      deltaId match {
        case Some(id) => tryWrite(id); id
        case None =>
          var id = deltas(spark, path).lastOption.map(_ + 1).getOrElse(0L)
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
    val (dRows, cols) = readDeltas(spark, path, ids)
    // cross-delta winner per key, ties by delta id (later wins) —
    // the same rule the reader applies
    val winners = dRows
      .withColumn("_pri", col("_src"))
      .groupBy(col(spec.keyCol))
      .agg(max_by(struct(cols.map(col): _*),
        struct((spec.orderCols :+ "_pri").map(col): _*)).as("_w"))
      .select(col("_w.*"))
    applyChanges(spark, path, winners)
    val f = fs(spark, new Path(path))
    ids.foreach(id => f.delete(new Path(s"$path/delta=$id"), true))
    spark.catalog.refreshByPath(path)
    ids.size
  }

  /** All delta rows with `_src` = delta id + 1 (0 is the base's
    * rank), plus the column list (dataCols incl. op) they carry. */
  private def readDeltas(spark: SparkSession, path: String,
                         ids: Seq[Long]): (DataFrame, Seq[String]) = {
    val df = spark.read.option("basePath", path)
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
  def readTable(spark: SparkSession, path: String): DataFrame = {
    val spec = readSpec(spark, path)
    val ids = deltas(spark, path)
    if (ids.isEmpty)
      return readRaw(spark, path).filter(col("op") =!= "D").drop("op", "bucket")
    val (dRows, cols) = readDeltas(spark, path, ids)
    val base = readRaw(spark, path).withColumn("_src", lit(0L))
    val merged = base.unionByName(dRows)
      .withColumn("_pri", col("_src"))
      .groupBy(col(spec.keyCol))
      .agg(max_by(struct(cols.map(col): _*),
        struct((spec.orderCols :+ "_pri").map(col): _*)).as("_w"))
      .select(col("_w.*"))
    merged.filter(col("op") =!= "D").drop("op")
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
    spark.read.option("basePath", path).parquet(committed: _*)
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
