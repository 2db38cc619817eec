package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Per-key top-k as a first-class operator — the custom-plan tier
  * (SURVEY.md §7 "built-in vs custom" (c)): logical node + planner
  * strategy + physical partial/final execs, registered via
  * `SparkSessionExtensions` / `spark.experimental.extraStrategies`.
  *
  * Spark has `TakeOrderedAndProject` for GLOBAL top-k, but per-key top-k
  * normally compiles to a rank window: shuffle everything on the key,
  * SORT EVERY PARTITION COMPLETELY, rank, filter. At 100 TB that full
  * sort is the cost. This operator keeps one bounded heap of k rows per
  * key instead:
  *
  *   - partial exec (map side, any distribution): each input partition
  *     reduces to <= k rows per key it has seen — shuffle volume drops
  *     from |rows| to <= k * keys * partitions
  *   - final exec (requires ClusteredDistribution on the key): merges
  *     the survivors with the same bounded heaps
  *
  * Memory is O(keys-per-partition * k), never a full-partition sort
  * buffer; time is O(n log k) vs the window's O(n log n) per partition.
  * The `order` must be a TOTAL order (break ties — e.g. by a unique id)
  * for deterministic results.
  */
case class TopKPerKey(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
                      child: LogicalPlan) extends UnaryNode {
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
                          partial: Boolean, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def nodeName: String =
    if (partial) "TopKPerKeyPartial" else "TopKPerKeyFinal"

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(keys))

  override protected def doExecute(): RDD[InternalRow] = {
    val (ks, so, kk, childOut) = (keys, order, k, child.output)
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(ks, childOut)
      val ord = RowOrdering.create(so, childOut)
      // heap root = worst kept row (reverse order), evicted on better input
      val rev = new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int = ord.compare(b, a)
      }
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](kk + 1, rev)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kk) heap.add(row.copy())
        else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll(); heap.add(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}
