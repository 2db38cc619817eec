package graft

import graft.core.BucketedWarehouse
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** The bucketed-storage contract: a join or aggregation on the bucket
  * key must be satisfied by the on-disk layout — zero shuffle
  * exchanges, zero sorts — and point filters on the key must prune to a
  * single bucket. Results stay identical to the unbucketed plan. */
class BucketedJoinSpec extends SparkTestBase {

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // materialize so AQE finalizes its plan
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p                        => p.toString
    }
  }

  private def withNoBroadcast[A](body: => A): A = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try body finally spark.conf.set(key, prev)
  }

  private def withConf[A](key: String, value: String)(body: => A): A = {
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("join + agg on the bucket key runs with zero exchanges and zero sorts") {
    withNoBroadcast {
      // sort trust: the writer guarantees one sorted file per bucket,
      // but since 3.0 the scan only REPORTS that ordering under the
      // opt-in conf — set it, as a cluster deployment of bucketed
      // fact tables would (without it the join is still exchange-free,
      // it just re-sorts each bucket in memory)
      withConf("spark.sql.legacy.bucketedTableScan.outputOrdering", "true") {
      val (liT, ordT) = BucketedWarehouse.factPair(spark, sf())
      val li = spark.table(liT)
        .select(col("l_orderkey"), col("l_quantity"))
      val ord = spark.table(ordT)
        .select(col("o_orderkey"), col("o_totalprice"))
      // join on the bucket key, then aggregate BY the bucket key: the
      // bucketed distribution satisfies both, so the whole plan is
      // scan -> SMJ (bucket zip) -> hash agg, exchange-free end to end
      val joined = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("qty"), count(lit(1)).as("n"))
      val plan = finalPlan(joined)
      assert(plan.contains("SortMergeJoin"), s"expected a sort-merge bucket zip:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join/agg on the bucket key must not shuffle:\n$plan")
      // no Sort operator NODE either — both sides are sortBy'd on disk.
      // (match the operator prefix "Sort [" — 'SortMergeJoin' contains
      // the substring)
      assert(!plan.contains("Sort ["),
        s"bucketed join must not re-sort sorted buckets:\n$plan")
      }
    }
  }

  test("bucketed results equal the unbucketed join exactly") {
    val (liT, ordT) = BucketedWarehouse.factPair(spark, sf())
    val viaBuckets = spark.table(liT)
      .join(spark.table(ordT), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val t = graft.sources.Tables(spark, sf())
    val raw = t.lineitem.join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(viaBuckets === raw)
  }

  test("a point filter on the bucket key prunes to one bucket") {
    val (liT, _) = BucketedWarehouse.factPair(spark, sf())
    // a bare filter needs no output distribution, so AQE's
    // DisableUnnecessaryBucketedScan would demote the scan (pruning
    // still happens, but the scan no longer reports it) — pin the
    // bucketed scan on so the decision is observable
    withConf("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false") {
    val one = spark.table(liT).filter(col("l_orderkey") === 42L)
    one.collect()
    // read the pruning decision off the scan node itself (the toString
    // form truncates metadata); unwrap AQE — the adaptive node is a
    // leaf to collect()
    val finalized = one.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p                        => p
    }
    val scans = finalized.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty, "expected a file scan")
    val selected = scans.head.metadata.get("SelectedBucketsCount")
    assert(selected.exists(_.startsWith("1 out of 8")),
      s"point lookup must read a single bucket, got $selected")
    }
  }

  test("append keeps the join exchange-free; compact restores one sorted file per bucket") {
    // a PRIVATE table — the shared factPair artifact must stay
    // byte-identical to the raw parquet for the equality tests and the
    // oracle gate
    val loc = java.nio.file.Files.createTempDirectory("graft-bkt-life")
      .toString + "/li"
    val name = "graft_bkt_lifecycle_test"
    BucketedWarehouse.ensure(spark, name, loc, 8, "l_orderkey")(
      graft.sources.Tables(spark, sf()).lineitem)
    val before = spark.table(name).count()
    def filesPerBucket(): Int = spark.table(name).inputFiles.length / 8
    assert(filesPerBucket() === 1)
    // append a small batch (re-ingest of a slice, ids intact — layout
    // behavior is what's under test, not dedup semantics)
    val batch = graft.sources.Tables(spark, sf()).lineitem
      .filter(col("l_orderkey") % 100 === 0)
    val batchN = batch.count()
    BucketedWarehouse.append(spark, name, batch)
    assert(spark.table(name).count() === before + batchN)
    assert(filesPerBucket() === 2) // one more file per bucket
    withNoBroadcast {
      // distribution still holds: the self-aggregation stays
      // exchange-free even with two files per bucket
      val plan = finalPlan(spark.table(name).groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n")))
      assert(!plan.contains("Exchange"),
        s"appended bucketed table must keep the bucket distribution:\n$plan")
    }
    BucketedWarehouse.compact(spark, name)
    assert(filesPerBucket() === 1) // v2 layout restored
    assert(spark.table(name).count() === before + batchN) // rows moved, not lost
    spark.sql(s"DROP TABLE $name")
  }

  test("warm re-registration validates the declared spec against the written-with manifest") {
    val loc = java.nio.file.Files.createTempDirectory("graft-bkt-spec")
      .toString + "/li"
    val name = "graft_bkt_spec_test"
    val slice = graft.sources.Tables(spark, sf()).lineitem
      .filter(col("l_orderkey") < 1000)
    BucketedWarehouse.ensure(spark, name, loc, 8, "l_orderkey")(slice)
    val rows = spark.table(name).count()
    spark.sql(s"DROP TABLE $name") // cold catalog, warm store

    // drifted bucket count → loud failure, no table registered
    val e1 = intercept[IllegalArgumentException] {
      BucketedWarehouse.ensure(spark, name, loc, 16, "l_orderkey")(slice)
    }
    assert(e1.getMessage.contains("buckets=8"), e1.getMessage)
    assert(!spark.catalog.tableExists(name))
    // drifted key → loud failure
    val e2 = intercept[IllegalArgumentException] {
      BucketedWarehouse.ensure(spark, name, loc, 8, "l_partkey")(slice)
    }
    assert(e2.getMessage.contains("key=l_orderkey"), e2.getMessage)
    // matching spec → registers over the existing files
    BucketedWarehouse.ensure(spark, name, loc, 8, "l_orderkey")(slice)
    assert(spark.table(name).count() === rows)
    spark.sql(s"DROP TABLE $name")

    // pre-manifest store (manifest deleted): the filename fallback
    // still catches a wrong count, and accepts the written-with one
    val fs = new org.apache.hadoop.fs.Path(loc)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(loc, "_graft_bucket_spec"), false)
    val e3 = intercept[IllegalArgumentException] {
      BucketedWarehouse.ensure(spark, name, loc, 16, "l_orderkey")(slice)
    }
    assert(e3.getMessage.contains("bucket ids"), e3.getMessage)
    BucketedWarehouse.ensure(spark, name, loc, 8, "l_orderkey")(slice)
    assert(spark.table(name).count() === rows)
    // the successful fallback BACKFILLS the manifest (the filename
    // check can't see the key; the manifest makes it checkable on
    // every later re-registration) — so a now-drifted KEY fails loud
    assert(fs.exists(new org.apache.hadoop.fs.Path(loc, "_graft_bucket_spec")),
      "fallback validation must backfill the spec manifest")
    spark.sql(s"DROP TABLE $name")
    val e4 = intercept[IllegalArgumentException] {
      BucketedWarehouse.ensure(spark, name, loc, 8, "l_partkey")(slice)
    }
    assert(e4.getMessage.contains("key=l_orderkey"), e4.getMessage)

    // a manifest that EXISTS but is garbage is corruption, not a
    // pre-manifest store: loud failure with the rebuild hint
    val specPath = new org.apache.hadoop.fs.Path(loc, "_graft_bucket_spec")
    fs.delete(specPath, false)
    val out = fs.create(specPath, true)
    try out.write("buckets=not-a-number\nkey=l_orderkey\n".getBytes("UTF-8"))
    finally out.close()
    val e5 = intercept[IllegalStateException] {
      BucketedWarehouse.ensure(spark, name, loc, 8, "l_orderkey")(slice)
    }
    assert(e5.getMessage.contains("unreadable spec manifest"), e5.getMessage)
  }

  test("split doubles the bucket count shuffle-free and keeps every contract") {
    val loc = java.nio.file.Files.createTempDirectory("graft-bkt-split")
      .toString + "/li"
    val name = "graft_bkt_split_test"
    BucketedWarehouse.ensure(spark, name, loc, 8, "l_orderkey")(
      graft.sources.Tables(spark, sf()).lineitem)
    val before = spark.table(name).groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap

    // observe the split's actual execution: count shuffle records
    // written across it, then drain the (async) listener bus with a
    // known-size sentinel shuffle — the assertion is "total == the
    // sentinel's records", i.e. the split itself shuffled NOTHING
    val shuffled = new java.util.concurrent.atomic.AtomicLong(0)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          shuffled.addAndGet(t.taskMetrics.shuffleWriteMetrics.recordsWritten)
    }
    val tableRows = spark.table(name).count()
    spark.sparkContext.addSparkListener(l)
    try {
      BucketedWarehouse.split(spark, name)
      spark.range(100).repartition(2).count() // sentinel: exactly 100
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (shuffled.get() < 100 && System.nanoTime() < deadline)
        Thread.sleep(50)
    } finally spark.sparkContext.removeSparkListener(l)
    // the sentinel writes its 100 repartition rows plus a handful of
    // count() partial-agg rows; a split that shuffled would add the
    // whole table (thousands of rows) — the bound separates the two
    assert(shuffled.get() >= 100L && shuffled.get() < 100L + tableRows / 2,
      s"split must not shuffle its $tableRows rows " +
        s"(only the sentinel may): ${shuffled.get()}")

    // catalog spec doubled; rows intact; v2 one-file-per-bucket holds
    val spec = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(name)).bucketSpec.get
    assert(spec.numBuckets === 16)
    val after = spark.table(name).groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(after === before)
    assert(spark.table(name).inputFiles.length === 16,
      "split must keep one sorted file per (now doubled) bucket")

    // the doubled layout still satisfies key-distribution demands
    // (zero-exchange agg) and point filters prune to 1 of 16
    withNoBroadcast {
      val plan = finalPlan(spark.table(name).groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n")))
      assert(!plan.contains("Exchange"),
        s"split table must keep the bucket distribution:\n$plan")
    }
    withConf("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false") {
      val one = spark.table(name).filter(col("l_orderkey") === 42L)
      one.collect()
      val finalized = one.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p                        => p
      }
      val selected = finalized.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }.head.metadata.get("SelectedBucketsCount")
      assert(selected.exists(_.startsWith("1 out of 16")),
        s"post-split point lookup must read a single bucket, got $selected")
    }
    spark.sql(s"DROP TABLE $name")
  }

  test("a fresh catalog re-registers committed bucketed files without rewriting") {
    // factPair above committed the artifact; drop the catalog entries
    // to simulate a new session over a warm store, then re-ensure —
    // the DDL path must restore full bucket trust (zero-exchange join)
    val (liT, ordT) = BucketedWarehouse.factPair(spark, sf())
    val before = spark.table(liT).count()
    spark.sql(s"DROP TABLE $liT")
    spark.sql(s"DROP TABLE $ordT")
    val (liT2, ordT2) = BucketedWarehouse.factPair(spark, sf())
    assert(liT2 === liT && ordT2 === ordT)
    assert(spark.table(liT2).count() === before)
    withNoBroadcast {
      val plan = finalPlan(
        spark.table(liT2).select(col("l_orderkey"))
          .join(spark.table(ordT2).select(col("o_orderkey")),
            col("l_orderkey") === col("o_orderkey")))
      assert(!plan.contains("Exchange"),
        s"re-registered bucketed tables must keep the zero-shuffle join:\n$plan")
    }
  }
}
