package graft.agg

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Order-independent multiplicative group checksum: the product of the
  * inputs in Z/2^64 (Long multiplication's natural wraparound IS mod
  * 2^64 on the unsigned bit pattern). Feed it odd values (`x | 1`) so
  * factors are units of the ring and no input collapses the product to
  * a zero divisor's orbit.
  *
  * This is the §2.9 `AggregateFunction` surface (SURVEY.md) exercised
  * for real: a typed `Aggregator[Long, Long, Long]` registered through
  * `udaf(...)`, usable from both the DataFrame API and SQL. The reduce
  * is commutative and associative, so Spark runs it with map-side
  * partial aggregation and the result is independent of row order and
  * partitioning — which is exactly what makes it useful at 100 TB:
  * comparing per-group checksums of content hashes across two runs (or
  * two copies) of a corpus detects any changed/missing/duplicated
  * document without sorting or shuffling full contents.
  */
object ModProduct extends Aggregator[Long, Long, Long] {
  override def zero: Long = 1L
  override def reduce(acc: Long, x: Long): Long = acc * x
  override def merge(a: Long, b: Long): Long = a * b
  override def finish(acc: Long): Long = acc
  override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong

  /** DataFrame-side column: `product_mod64(x)`. */
  def product_mod64(c: Column): Column = udaf(ModProduct).apply(c)

  /** Reference implementation for tests. */
  def reference(xs: Seq[Long]): Long = xs.foldLeft(1L)(_ * _)
}
