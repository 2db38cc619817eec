package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ext.Layout

/** The file-skipping tier's contract:
  *  - the Z-interleave Column math is the Morton code it claims;
  *  - a layout is content-preserving (query equality vs the original);
  *  - the layouts actually PRUNE: a selective pushed predicate reads
  *    a fraction of the records off the laid-out copy that the same
  *    predicate reads off a round-robin (worst-case) copy — measured
  *    through task input metrics, drained with a known-size sentinel
  *    (the BucketedJoinSpec listener pattern);
  *  - Z beats a single-column sort on a predicate over the SECOND
  *    dimension only — the property that justifies interleaving.
  */
class LayoutSpec extends SparkTestBase {
  import spark.implicits._

  private def zOf(a: Int, b: Int): Int =
    Seq((a, b)).toDF("a", "b")
      .select(Layout.zValue16(col("a"), col("b")).as("z"))
      .head().getInt(0)

  test("zValue16 is the Morton interleave: even bits from b1, odd from b2") {
    assert(zOf(0xFF, 0x00) === 0x5555)
    assert(zOf(0x00, 0xFF) === 0xAAAA)
    assert(zOf(0xFF, 0xFF) === 0xFFFF)
    assert(zOf(0x00, 0x00) === 0x0000)
    // bit i of each input lands at 2i / 2i+1
    for (i <- 0 until 8) {
      assert(zOf(1 << i, 0) === (1 << (2 * i)))
      assert(zOf(0, 1 << i) === (1 << (2 * i + 1)))
    }
    // interleave is monotone in each argument with the other fixed
    val zs = (0 until 256 by 17).map(v => zOf(v, 93))
    assert(zs === zs.sorted)
  }

  test("cellIdx maps values to equi-depth cells against the bounds") {
    val df = spark.range(1000).select(col("id").cast("double").as("v"))
    val bounds = Layout.quantileBounds(df, "v", 4)
    assert(bounds.length === 3)
    val cells = df.select(Layout.cellIdx(col("v"), bounds).as("c"))
      .groupBy("c").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(cells.keySet === Set(0, 1, 2, 3))
    // equi-depth: each cell holds ~250 of 1000 (sketch eps slack)
    cells.values.foreach(n => assert(n > 150 && n < 350, s"cells: $cells"))
  }

  // --- pruning: records read, via task input metrics -------------------

  /** Records read while running `q`. The listener bus is async, so
    * the counter is read only after it QUIESCES (unchanged for 1 s,
    * 30 s deadline) — a snapshot taken right after the action can
    * miss task-end events still queued, undercounting q and letting
    * the prune assertions pass (or the full-scan floor fail)
    * spuriously. */
  private def recordsRead(q: => Unit): Long = {
    val read = new java.util.concurrent.atomic.AtomicLong(0)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          read.addAndGet(t.taskMetrics.inputMetrics.recordsRead)
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val before = read.get()
      q
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      var last = -1L
      while ({
        val now = read.get()
        val moving = now != last
        last = now
        moving && System.nanoTime() < deadline
      }) Thread.sleep(1000)
      last - before
    } finally spark.sparkContext.removeSparkListener(l)
  }

  private lazy val li = graft.sources.Tables(spark, sf("sf0.01")).lineitem

  private lazy val tmp =
    java.nio.file.Files.createTempDirectory("graft-layout").toString

  /** Round-robin copy: every file spans the whole value domain —
    * stats prune nothing; the honest worst-case baseline. */
  private lazy val shuffledPath: String = {
    val p = s"$tmp/shuffled"
    li.repartition(16).write.parquet(p)
    p
  }
  private lazy val rangePath: String = {
    val p = s"$tmp/range"
    Layout.rangeLayout(li, Seq("l_shipdate"), p, 16)
    p
  }
  private lazy val zPath: String = {
    val p = s"$tmp/zorder"
    Layout.zorderLayout(li, "l_shipdate", "l_extendedprice", p, 16)
    p
  }

  private def quarter(df: DataFrame): DataFrame =
    df.filter(col("l_shipdate") >= lit("1997-03-01") &&
              col("l_shipdate") <  lit("1997-06-01"))

  private def priceBand(df: DataFrame): DataFrame =
    df.filter(col("l_extendedprice").between(20000, 22000))

  test("layouts are content-preserving: same aggregate off any copy") {
    val want = quarter(li).agg(count(lit(1)), sum("l_quantity")).head()
    assert(quarter(spark.read.parquet(rangePath))
      .agg(count(lit(1)), sum("l_quantity")).head() === want)
    assert(quarter(spark.read.parquet(zPath))
      .agg(count(lit(1)), sum("l_quantity")).head() === want)
    assert(spark.read.parquet(zPath).count() === li.count())
  }

  test("range layout prunes the shipdate window; round-robin reads it all") {
    val total = li.count() // 60k
    val offRobin = recordsRead {
      quarter(spark.read.parquet(shuffledPath)).agg(count(lit(1))).head()
    }
    val offRange = recordsRead {
      quarter(spark.read.parquet(rangePath)).agg(count(lit(1))).head()
    }
    // worst case reads every record; the layout reads the ~4% window's
    // row groups only (file-grained here: 16 files over 7 years, the
    // 3-month window touches 1-2)
    assert(offRobin >= total,
      s"round-robin baseline must scan all $total rows, read $offRobin")
    assert(offRange <= total / 4,
      s"range layout should prune to <1/4 of $total, read $offRange")
  }

  test("zorder prunes on the SECOND dimension where a plain sort cannot") {
    val total = li.count()
    // price-only predicate: the range layout (sorted by shipdate) has
    // price min/max spanning the whole domain in every file - no help
    val offRange = recordsRead {
      priceBand(spark.read.parquet(rangePath)).agg(count(lit(1))).head()
    }
    val offZ = recordsRead {
      priceBand(spark.read.parquet(zPath)).agg(count(lit(1))).head()
    }
    assert(offRange >= total * 3 / 4,
      s"shipdate sort gives ~no price pruning, expected ~$total, read $offRange")
    assert(offZ <= total / 2,
      s"zorder should prune the price band to <1/2 of $total, read $offZ")
    assert(offZ * 2 <= offRange,
      s"zorder ($offZ) should read at most half of the range layout ($offRange)")
  }
}
