package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch primitives for the heavy-hitters screen
  * (`AnalysisQueries.heavyShingles`).
  *
  * The operating contract mirrors [[Bloom]]'s: the sketch is built in
  * one bounded aggregation (≤ d·w rows shuffle, however large the
  * input), collected, and probed as a pure projection against array
  * LITERALS — d·w counters (4 × 8192 longs = 256 KB by default),
  * bounded by the sketch dimensions, never by the corpus. A CMS
  * estimate NEVER undercounts (each of the d counters saw every
  * occurrence of the value, plus collisions), so `estimate >= T` is a
  * COMPLETE-RECALL screen for `count >= T`: the exact second pass over
  * the surviving candidates removes the collision-inflated false
  * positives and nothing else. That is what lets the heavy-hitters
  * query share the plain `HAVING count >= T` oracle verbatim — the
  * same share-the-unguarded-oracle proof the salt-split and
  * write-time-cap registrations use.
  *
  * Sizing: w ≈ e/ε for overcount ≤ ε·N per row with d = ln(1/δ) rows;
  * at 100 TB the point is that w scales with the TOLERANCE, not the
  * vocabulary — the screen's shuffle carries only candidate
  * occurrences while the naive plan shuffles the full token stream
  * into a vocabulary-sized aggregation.
  *
  * Both hash families: "md5" (DuckDB-portable; staged prefix like
  * [[Bloom.md5Stage]]) and "xxh64" (production codegen). */
object CountMin {

  /** 4 rows × 8192 counters = 256 KB of literals. */
  val DefaultD: Int = 4
  val DefaultW: Int = 1 << 13

  /** Counter position of value `ng` for sketch row `j`. md5 mode is
    * the minhash slice discipline ([[Bloom.md5Stage]]'s rationale):
    * row `j` reads the disjoint 4-hex slice [4j+1, 4j+4] of ONE
    * digest — d independent uniform 16-bit values, and `w` (a power
    * of two <= 2^16) divides 2^16 so the mod keeps each uniform.
    * The previous family salted one md5 PER ROW (`md5('cmsj_'||ng)`):
    * d digests per occurrence, and md5 is the whole cost of the
    * sketch in oracle mode. */
  def position(j: Int, ng: Column, hashMode: String, w: Int): Column =
    hashMode match {
      case "md5" => posFromHex(j, md5(ng), w)
      case "xxh64" => pmod(xxhash64(lit(s"cms$j"), ng), lit(w.toLong))
      case other => throw new IllegalArgumentException(
        s"hashMode must be md5 or xxh64, got: $other")
    }

  private def posFromHex(j: Int, hx: Column, w: Int): Column = {
    require(w <= (1 << 16) && (((1 << 16) % w) == 0),
      s"md5-slice positions need w a power of two <= 2^16, got $w")
    require(j < 8, s"md5 has 32 hex chars = 8 disjoint 4-hex slices; row $j")
    conv(substring(hx, 4 * j + 1, 4), 16, 10).cast("long") % w
  }

  /** Stage the per-row digest once: (ng, __hx) where __hx is the FULL
    * 32-hex md5(ng) — ONE digest serving all d rows of BOTH the build
    * and the screen (staging across the two actions halved the
    * query's md5 count, 12.4 → 4.8 s at sf0.1; the slice family then
    * cut the remaining d-digests-per-action to one). The full digest
    * (not the first 4d chars) is staged deliberately: a frame staged
    * for one d then probed with a larger sketch would otherwise slice
    * past the stored prefix into silent NULL positions — with all 32
    * chars stored, every d <= 8 slices in range (posFromHex requires
    * that bound loudly). Callers persist the result (it feeds two
    * actions AND is the filter-pushdown barrier — see
    * [[stagedEstimate]]). */
  def stagePrefixes(occurrences: DataFrame, d: Int = DefaultD): DataFrame =
    occurrences.select(col("ng"), md5(col("ng")).as("__hx"))

  private def posFromPrefix(j: Int, w: Int): Column =
    posFromHex(j, col("__hx"), w)

  /** Build the d×w counter matrix from an OCCURRENCE frame (one row
    * per occurrence — repeats are the counts): either a raw (ng) frame
    * (xxh64 mode hashes inline) or a [[stagePrefixes]] frame (md5 mode
    * folds the staged prefixes). One explode to (row, pos), one
    * bounded groupBy (≤ d·w result rows), densified driver-side so
    * every probe is an O(1) array read. */
  def build(occurrences: DataFrame, hashMode: String = "md5",
            d: Int = DefaultD, w: Int = DefaultW): Seq[Seq[Long]] = {
    val staged = hashMode match {
      case "md5" if !occurrences.columns.contains("__hx") =>
        stagePrefixes(occurrences, d)
      case _ => occurrences
    }
    // the staged-prefix path is md5-only: an xxh64-mode frame that
    // happens to carry a __hx column must still hash with xxh64, not
    // silently fold md5 slices (r13 advisor)
    def pos(j: Int): Column =
      if (hashMode == "md5" && staged.columns.contains("__hx"))
        posFromPrefix(j, w)
      else position(j, col("ng"), hashMode, w)
    val counts = staged
      .select(explode(array((0 until d).map(j =>
        struct(lit(j).as("j"), pos(j).as("p"))): _*)).as("jp"))
      .groupBy(col("jp.j").as("j"), col("jp.p").as("p"))
      .agg(count(lit(1)).as("c"))
      .collect()
    val rows = Array.fill(d)(Array.fill(w)(0L))
    counts.foreach(r => rows(r.getInt(0))(r.getLong(1).toInt) = r.getLong(2))
    rows.map(_.toSeq).toSeq
  }

  /** The point estimate: min over the d counters — lambda-safe pure
    * projection against the embedded literals. Self-contained form for
    * xxh64 (one hash per row) and small frames; the md5 HOT PATH must
    * go through [[stagedEstimate]] — inlined, the digest re-evaluates
    * once per slice (d× per occurrence); staged it runs once (the
    * bloomDecontaminate staging lesson, ProfileBloom-measured). */
  def estimate(sketch: Seq[Seq[Long]], ng: Column, hashMode: String,
               w: Int = DefaultW): Column =
    least(sketch.zipWithIndex.map { case (row, j) =>
      element_at(typedlit(row), (position(j, ng, hashMode, w) + 1).cast("int"))
    }: _*)

  /** (ng, est) with the digest STAGED one projection below the conv
    * slices — ONE md5 per occurrence serving all d rows. The safety
    * invariant for callers filtering on `est`: the staged `__hx`
    * digest must sit behind a CACHE BARRIER below the filter.
    * PushDownPredicates substitutes through projects (the measured
    * Bloom trap), so over a RAW input the pushed filter re-inlines
    * md5 once per slice — d digests per occurrence; over a persisted
    * [[stagePrefixes]] frame (heavyShingles' shape) the substitution
    * bottoms out at the cache's materialized __hx column and
    * re-inlines only the cheap conv/substring slices — no second
    * persist of this function's RESULT is needed (r14: removing that
    * est persist was 14.2 → 10.0 s at the 500k decade). */
  def stagedEstimate(occurrences: DataFrame, sketch: Seq[Seq[Long]],
                     hashMode: String, w: Int = DefaultW): DataFrame =
    hashMode match {
      case "md5" =>
        val staged =
          if (occurrences.columns.contains("__hx")) occurrences
          else stagePrefixes(occurrences, sketch.length)
        staged.select(col("ng"),
          least(sketch.zipWithIndex.map { case (row, j) =>
            element_at(typedlit(row),
              (posFromPrefix(j, w) + 1).cast("int"))
          }: _*).as("est"))
      case _ =>
        occurrences.select(col("ng"),
          estimate(sketch, col("ng"), hashMode, w).as("est"))
    }
}
