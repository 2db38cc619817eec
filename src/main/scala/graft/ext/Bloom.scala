package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter primitives for the decontamination screen —
  * `AnalysisQueries.bloomDecontaminate` (batch) and
  * `StreamDedup.bloomScreen` (the same screen in the ingest path).
  *
  * m bits, 3 hash functions; both hash families are engine-portable:
  * "md5" (DuckDB-exact — ONE digest per value, each position reading a
  * disjoint 5-hex slice of its first 15 chars; see [[md5Stage]]) and
  * "xxh64" (production — one codegen'd xxhash64 per probe).
  *
  * Everything here is built from `Column` HANDLES, not SQL names, so
  * the probe composes inside higher-order-function lambdas — which is
  * what lets the streaming screen test each shingle inside
  * `aggregate(sh, ...)` as a pure per-row projection: stateless in
  * append mode, no explode, no groupBy, no watermark. The bit array
  * itself travels as a 32 KB literal (bounded by m, never by the
  * corpus — see bloomDecontaminate's design notes). */
object Bloom {

  /** 2^18 bits = 32 KB; size m at ~14 bits per expected eval n-gram. */
  val DefaultM: Int = 1 << 18

  /** The first 15 md5 hex chars of `ng` — ONE digest serving all 3
    * positions, staged by callers on hot paths. This is the minhash
    * slice discipline ([[Dedup.minhashChunk]]: one md5 per shingle,
    * four 32-bit chunks) extended to the Bloom family: position `j`
    * is the disjoint 5-hex slice [5j+1, 5j+5] — three independent
    * uniform 20-bit values from one digest, and `m` (a power of two
    * <= 2^20) divides 2^20 so the mod keeps each slice uniform.
    * Before the slice swap each position salted its OWN md5
    * (`md5('bloomj_' || ng)`): 3 digests per probed shingle, and md5
    * is the whole cost of the screen in oracle mode — measured
    * 3.0 -> 1.7 s on x_bloom_decontaminate at sf0.1. */
  def md5Stage(ng: Column): Column = substring(md5(ng), 1, 15)

  /** Bit position of hash `j` from the staged 15-hex digest prefix. */
  def posFromMd5Stage(j: Int, hx: Column, m: Int): Column = {
    require(m <= (1 << 20) && (((1 << 20) % m) == 0),
      s"md5-slice positions need m a power of two <= 2^20, got $m")
    require(j >= 0 && j < 3,
      s"the staged prefix is 15 hex chars = 3 disjoint 5-hex slices; " +
        s"position $j would slice past it into silent NULLs")
    conv(substring(hx, 5 * j + 1, 5), 16, 10).cast("long") % m
  }

  /** The 3 bit positions of `ng`, self-contained (used where staging
    * doesn't matter: the eval-sized build, per-shingle HOF lambdas —
    * lambda bodies get no CSE, so the md5 still evaluates once per
    * slice there; projection callers stage [[md5Stage]] instead). */
  def positions(ng: Column, hashMode: String, m: Int): Seq[Column] =
    hashMode match {
      case "md5"   => (0 until 3).map(j => posFromMd5Stage(j, md5Stage(ng), m))
      case "xxh64" => (0 until 3).map(j =>
        pmod(xxhash64(lit(s"bloom$j"), ng), lit(m.toLong)))
      case other => throw new IllegalArgumentException(
        s"hashMode must be md5 or xxh64, got: $other")
    }

  /** Null-safe single-bit probe of the embedded bit array at position
    * `p` (<=> so no isnotnull filter is inferred and pushed into the
    * position computation — see bloomDecontaminate). */
  def bitTest(bits: Seq[Long], p: Column): Column =
    !(element_at(typedlit(bits), (shiftright(p, 6) + 1).cast("int"))
      .bitwiseAND(call_function("shiftleft", lit(1L),
        p.bitwiseAND(lit(63L)).cast("int"))) <=> lit(0L))

  /** All-3-positions-set test for one n-gram value — lambda-safe. */
  def hit(bits: Seq[Long], ng: Column, hashMode: String, m: Int): Column =
    positions(ng, hashMode, m).map(bitTest(bits, _)).reduce(_ && _)

  /** Build the dense bit array from a frame with a distinct `ng`
    * column: 3 positions per n-gram -> distinct -> word-indexed bit_or
    * (at most m/64 rows however large the input) -> ONE densified row,
    * collected. The result is bounded by m (m/8 bytes), never by the
    * data. */
  def buildBits(ngrams: DataFrame, hashMode: String = "md5",
                m: Int = DefaultM): Seq[Long] = {
    val pos = hashMode match {
      case "md5" => ngrams
        .select(md5Stage(col("ng")).as("hx"))
        .select(explode(array((0 until 3).map(j =>
          posFromMd5Stage(j, col("hx"), m)): _*)).as("p"))
      case _ => ngrams
        .select(explode(array(positions(col("ng"), hashMode, m): _*)).as("p"))
    }
    pos.distinct()
      .groupBy(shiftright(col("p"), 6).as("w"))
      .agg(expr("bit_or(shiftleft(1L, cast(p % 64 as int)))").as("bits"))
      .groupBy()
      .agg(map_from_entries(collect_list(struct(col("w"), col("bits")))).as("bm"))
      // densify ONCE at build: Spark map lookups are linear MapData
      // scans, a dense array makes every later probe O(1)
      .select(transform(sequence(lit(0L), lit((m / 64 - 1).toLong)),
        i => coalesce(element_at(col("bm"), i), lit(0L))).as("bloom"))
      .head().getSeq[Long](0)
  }
}
