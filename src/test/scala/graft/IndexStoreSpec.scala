package graft

import java.util.concurrent.atomic.AtomicInteger

import graft.core.IndexStore
import graft.ext.Dedup
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Hadoop-FS commit protocol for the persisted d9/y7 indexes: committed
  * = _SUCCESS visible through the PATH'S OWN FileSystem (so hdfs:// and
  * s3a:// work, not just driver-local disk), builds publish atomically
  * via scratch-dir + rename, and two concurrent first callers race
  * benignly. */
class IndexStoreSpec extends SparkTestBase {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft-idxstore").toString

  test("ensure builds once, commits via the Hadoop FileSystem, and reuses thereafter") {
    val path = freshDir() + "/idx"
    assert(!IndexStore.isCommitted(spark, path))
    val builds = new AtomicInteger(0)
    IndexStore.ensure(spark, path) { scratch =>
      builds.incrementAndGet()
      spark.range(10).toDF("id").write.parquet(scratch)
    }
    assert(IndexStore.isCommitted(spark, path))
    assert(builds.get() === 1)
    IndexStore.ensure(spark, path) { _ => builds.incrementAndGet() }
    assert(builds.get() === 1, "a committed index must not rebuild")
    assert(spark.read.parquet(path).count() === 10)
  }

  test("ensure is addressed through the path's FileSystem: an explicit file: URI works") {
    // java.io.File checks would also pass here, but the call path under
    // test is Path.getFileSystem -> fs.exists, i.e. the one that works
    // unchanged when the URI scheme is hdfs:// or s3a://
    val path = "file://" + freshDir() + "/idx"
    IndexStore.ensure(spark, path) { scratch =>
      spark.range(5).toDF("id").write.parquet(scratch)
    }
    assert(IndexStore.isCommitted(spark, path))
    assert(spark.read.parquet(path).count() === 5)
  }

  test("two concurrent first callers race benignly: one committed copy, no scratch left") {
    val base = freshDir()
    val path = base + "/idx"
    val builds = new AtomicInteger(0)
    val threads = (0 until 2).map { i =>
      new Thread(() => {
        IndexStore.ensure(spark, path) { scratch =>
          builds.incrementAndGet()
          // stagger slightly so both builders are in flight together
          Thread.sleep(50L * i)
          spark.range(100).toDF("id").write.parquet(scratch)
        }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(IndexStore.isCommitted(spark, path))
    assert(spark.read.parquet(path).count() === 100)
    // no half-built leftovers: the target dir's parent holds exactly the
    // committed index (losers delete their scratch dirs)
    val leftovers = new java.io.File(base).listFiles().map(_.getName).toSeq
    assert(leftovers === Seq("idx"), s"stray build dirs: $leftovers")
    // and no stray child inside the committed index from a rename-into-dir
    val children = new java.io.File(path).listFiles().map(_.getName).toSeq
    assert(!children.exists(_.startsWith("idx.build-")), s"stray child in $children")
  }

  test("ensure replaces a stale partial target (directory without _SUCCESS)") {
    val path = freshDir() + "/idx"
    // simulate a crashed pre-commit write: files on disk, no marker
    new java.io.File(path).mkdirs()
    new java.io.File(path, "part-00000.parquet").createNewFile()
    assert(!IndexStore.isCommitted(spark, path))
    IndexStore.ensure(spark, path) { scratch =>
      spark.range(7).toDF("id").write.parquet(scratch)
    }
    assert(IndexStore.isCommitted(spark, path))
    assert(spark.read.parquet(path).count() === 7)
  }

  test("stale recovery goes through an aside-rename and leaves no .stale leftovers") {
    val base = freshDir()
    val path = base + "/idx"
    new java.io.File(path).mkdirs()
    new java.io.File(path, "part-00000.parquet").createNewFile()
    IndexStore.ensure(spark, path) { scratch =>
      spark.range(3).toDF("id").write.parquet(scratch)
    }
    assert(IndexStore.isCommitted(spark, path))
    // the aside copy (idx.stale-*) must have been deleted after the
    // rename, and no build scratch remains either
    val leftovers = new java.io.File(base).listFiles().map(_.getName).toSeq
    assert(leftovers === Seq("idx"), s"recovery leftovers: $leftovers")
  }

  test("the published marker is written last, after the data rename") {
    // marker-last contract: the target's _SUCCESS is IndexStore's own
    // zero-length file, not the scratch's parquet-committer marker moved
    // along with the data (which on a per-file-copy store could become
    // visible mid-copy)
    val path = freshDir() + "/idx"
    IndexStore.ensure(spark, path) { scratch =>
      spark.range(4).toDF("id").write.parquet(scratch)
      // the build's own scratch marker exists before publish...
      assert(new java.io.File(scratch, "_SUCCESS").isFile)
    }
    // ...and the published marker is the freshly-created empty file
    val marker = new java.io.File(path, "_SUCCESS")
    assert(marker.isFile && marker.length() === 0)
    assert(spark.read.parquet(path).count() === 4)
  }

  test("ensure fails loudly when the build produces no committed artifact") {
    val path = freshDir() + "/idx"
    intercept[IllegalArgumentException] {
      IndexStore.ensure(spark, path) { _ => () /* writes nothing */ }
    }
    assert(!IndexStore.isCommitted(spark, path))
  }

  test("replace swaps a committed artifact for the rebuilt one and leaves no leftovers") {
    val base = freshDir()
    val path = base + "/idx"
    IndexStore.ensure(spark, path) { scratch =>
      spark.range(10).toDF("id").write.parquet(scratch)
    }
    IndexStore.replace(spark, path) { scratch =>
      spark.range(20).toDF("id").write.parquet(scratch)
    }
    assert(IndexStore.isCommitted(spark, path))
    assert(spark.read.parquet(path).count() === 20)
    // neither the build scratch nor the aside copy of the old artifact
    // survives the swap
    val leftovers = new java.io.File(base).listFiles().map(_.getName).toSeq
    assert(leftovers === Seq("idx"), s"replace leftovers: $leftovers")
    // marker-last: the published marker is IndexStore's own empty file
    val marker = new java.io.File(path, "_SUCCESS")
    assert(marker.isFile && marker.length() === 0)
  }

  test("a failed rebuild leaves the old artifact committed and untouched") {
    val base = freshDir()
    val path = base + "/idx"
    IndexStore.ensure(spark, path) { scratch =>
      spark.range(10).toDF("id").write.parquet(scratch)
    }
    // build writes nothing -> replace must refuse to swap
    intercept[IllegalArgumentException] {
      IndexStore.replace(spark, path) { _ => () }
    }
    assert(IndexStore.isCommitted(spark, path))
    assert(spark.read.parquet(path).count() === 10)
    // build throws -> same guarantee, and the scratch is cleaned up
    intercept[RuntimeException] {
      IndexStore.replace(spark, path) { _ =>
        throw new RuntimeException("boom")
      }
    }
    assert(IndexStore.isCommitted(spark, path))
    assert(spark.read.parquet(path).count() === 10)
    val leftovers = new java.io.File(base).listFiles().map(_.getName).toSeq
    assert(leftovers === Seq("idx"), s"failed-rebuild leftovers: $leftovers")
  }

  test("the publish grace is configurable: a slow winner inside the grace wins, outside fails") {
    // loser shape: the target exists (data, no marker) when the build
    // finishes, so ensure skips its own publish and polls isCommitted —
    // the WINNER's marker arrives only after `lagMs`. With a grace
    // shorter than the lag the loser must loud-fail (spuriously, which
    // is why the grace is a conf); with a grace covering the lag it must
    // return the winner's artifact.
    def slowWinner(graceMs: Long, lagMs: Long): Either[Throwable, String] = {
      val path = freshDir() + "/idx"
      val marker = new Thread(() => {
        Thread.sleep(lagMs)
        new java.io.File(path, "_SUCCESS").createNewFile()
      })
      spark.conf.set("spark.graft.index.publishGraceMs", graceMs.toString)
      try Right {
        IndexStore.ensure(spark, path) { scratch =>
          spark.range(5).toDF("id").write.parquet(scratch)
          // the "winner" appears mid-build: data visible, marker lagging
          new java.io.File(path).mkdirs()
          new java.io.File(path, "part-00000.parquet").createNewFile()
          marker.start()
        }
      } catch { case t: Throwable => Left(t) }
      finally {
        marker.join()
        spark.conf.unset("spark.graft.index.publishGraceMs")
      }
    }
    val tooShort = slowWinner(graceMs = 200, lagMs = 1500)
    assert(tooShort.isLeft, "a 200 ms grace must not cover a 1.5 s marker lag")
    val covered = slowWinner(graceMs = 10000, lagMs = 1500)
    assert(covered.isRight, s"a 10 s grace must cover a 1.5 s marker lag: $covered")
  }

  test("compactNeardupIndex refuses an artifact without the index schema") {
    val path = freshDir() + "/notanindex"
    IndexStore.ensure(spark, path) { scratch =>
      spark.range(5).toDF("id").write.parquet(scratch)
    }
    val e = intercept[IllegalArgumentException] {
      Dedup.compactNeardupIndex(spark, path, maxBucket = 10)
    }
    assert(e.getMessage.contains("writeNeardupIndex"))
    // and the refused artifact is untouched
    assert(spark.read.parquet(path).count() === 5)
  }

  test("d9 incremental path runs against an index addressed via a file: URI") {
    val docs = Tables(spark, sf()).documents
    val batchPred = col("doc_id") % 5 === 0
    val idx = "file://" + freshDir() + "/neardup"
    IndexStore.ensure(spark, idx) { scratch =>
      Dedup.writeNeardupIndex(docs.filter(!batchPred), scratch)
    }
    val viaUri = Dedup.incrementalNeardup(spark, docs.filter(batchPred), idx, 0.8)
      .select(col("batch_id"), col("corpus_id")).as[(Long, Long)].collect().toSet
    // same result as a plain local-path index (the existing d9 contract)
    val local = java.nio.file.Files.createTempDirectory("graft-d9-local").toString
    Dedup.writeNeardupIndex(docs.filter(!batchPred), local)
    val viaLocal = Dedup.incrementalNeardup(spark, docs.filter(batchPred), local, 0.8)
      .select(col("batch_id"), col("corpus_id")).as[(Long, Long)].collect().toSet
    assert(viaUri === viaLocal)
    assert(viaUri.nonEmpty)
  }

  test("readNeardupIndex rejects a missing or uncommitted path") {
    intercept[IllegalArgumentException] {
      Dedup.readNeardupIndex(spark, freshDir() + "/nope")
    }
  }

  test("pathFor is stable while the source data is unchanged and fresh " +
       "after an in-place regeneration") {
    val dataDir = freshDir()
    spark.range(10).write.mode("overwrite")
      .parquet(s"$dataDir/t.parquet")
    val p1 = IndexStore.pathFor(spark, "spec", dataDir)
    assert(p1 === IndexStore.pathFor(spark, "spec", dataDir),
      "same data, same artifact path — reuse is the point")
    // regenerate the table at the SAME path (different contents, so
    // different file sizes/mtimes): stale committed artifacts must not
    // be findable under the old key
    Thread.sleep(5) // mtime granularity guard
    spark.range(1000).write.mode("overwrite")
      .parquet(s"$dataDir/t.parquet")
    val p2 = IndexStore.pathFor(spark, "spec", dataDir)
    assert(p2 !== p1,
      "regenerated source data must key a FRESH artifact path")
    // a non-existent dataDir (remote-URI degradation path) still yields
    // a deterministic path
    assert(IndexStore.pathFor(spark, "spec", "hdfs://nn/corpus") ===
      IndexStore.pathFor(spark, "spec", "hdfs://nn/corpus"))
  }

  test("superseded-fingerprint artifacts are GC'd; other datasets and " +
       "in-flight scratches are not") {
    val dataDir = freshDir()
    spark.range(10).write.mode("overwrite").parquet(s"$dataDir/t.parquet")
    val p1 = IndexStore.ensure(spark, IndexStore.pathFor(spark, "gcspec", dataDir)) {
      scratch => spark.range(3).write.mode("overwrite").parquet(scratch)
    }
    // a DIFFERENT dataset of the same kind must survive the other's GC
    val otherDir = freshDir()
    spark.range(5).write.mode("overwrite").parquet(s"$otherDir/t.parquet")
    val pOther = IndexStore.ensure(spark,
        IndexStore.pathFor(spark, "gcspec", otherDir)) {
      scratch => spark.range(2).write.mode("overwrite").parquet(scratch)
    }
    // a scratch-shaped sibling of the CURRENT artifact must survive too
    val scratchSib = new java.io.File(p1 + ".build-deadbeef")
    assert(scratchSib.mkdirs())
    Thread.sleep(5)
    spark.range(1000).write.mode("overwrite").parquet(s"$dataDir/t.parquet")
    val p2 = IndexStore.pathFor(spark, "gcspec", dataDir) // triggers the GC
    assert(p2 !== p1)
    assert(!new java.io.File(p1).exists(),
      "the superseded-fingerprint artifact must be garbage-collected")
    assert(new java.io.File(pOther).exists(),
      "a different dataset's artifact must never be GC'd")
    assert(scratchSib.exists(),
      "in-flight build scratches must never be GC'd")
  }
}
