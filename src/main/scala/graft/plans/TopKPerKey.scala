package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
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
  *     from |rows| to <= k * keys * partitions. Memory is bounded: past
  *     `spark.graft.topk.partialFlushKeys` distinct keys the current
  *     heaps are emitted and the map restarts (the output stays a
  *     superset of each key's true top-k — a true top-k row can never
  *     meet k better rows inside one flush epoch, so it survives it)
  *   - final exec (requires ClusteredDistribution on the key AND, for
  *     orderable key types, child ordering on the key): consumes one
  *     key group at a time with a single k-heap, O(k) memory. The
  *     key-sort this requests covers only the partial's survivors and
  *     runs in Spark's spillable SortExec — the full input is never
  *     sorted. Non-orderable keys fall back to a hash map of heaps over
  *     survivors.
  *
  * Time is O(n log k) vs the window's O(n log n) per partition. The
  * `order` must be a TOTAL order (break ties — e.g. by a unique id)
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

  /** Sort-grouped final: one heap at a time instead of a map of heaps.
    * Only possible when the key type sorts (always, for keys that came
    * from a Window partitionSpec — map types are rejected there). */
  private def sortedFinal: Boolean = !partial && RowOrdering.isOrderable(keys)

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(keys))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    if (sortedFinal) Seq(keys.map(SortOrder(_, Ascending)))
    else Seq(Nil)

  // the grouped final emits key groups in key order (rows within a group
  // tie on the key, so key-ascending holds row-to-row) — downstream
  // key-sorts can be elided
  override def outputOrdering: Seq[SortOrder] =
    if (sortedFinal) keys.map(SortOrder(_, Ascending)) else Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val (ks, so, kk, childOut) = (keys, order, k, child.output)
    // partial: bound the heap map; final hash fallback must hold every
    // key of its (clustered) partition or it would emit >k per key
    val flushKeys =
      if (partial) {
        val key = "spark.graft.topk.partialFlushKeys"
        val raw = conf.getConfString(key, "65536")
        val v = try raw.toInt catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"$key must be a positive int, got '$raw'")
        }
        require(v > 0, s"$key must be a positive int, got $v" +
          " (0/negative would flush after every row, disabling map-side reduction)")
        v
      } else Int.MaxValue
    val grouped = sortedFinal
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(ks, childOut)
      val ord = RowOrdering.create(so, childOut)
      // heap root = worst kept row (reverse order), evicted on better input
      val rev = new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int = ord.compare(b, a)
      }
      def newHeap() = new java.util.PriorityQueue[InternalRow](kk + 1, rev)
      def insert(heap: java.util.PriorityQueue[InternalRow], row: InternalRow): Unit =
        if (heap.size < kk) heap.add(row.copy())
        else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll(); heap.add(row.copy())
        }

      if (grouped) new Iterator[InternalRow] {
        // input arrives key-sorted: detect group changes with the key
        // types' natural ordering (binary equality is too strict for the
        // sort's notion of equal)
        private val keyOrd = RowOrdering.createNaturalAscendingOrdering(ks.map(_.dataType))
        private var curKey: UnsafeRow = null
        private var heap = newHeap()
        private var drain: java.util.Iterator[InternalRow] =
          java.util.Collections.emptyIterator()
        private var done = false
        private def fill(): Unit =
          while (!drain.hasNext && !done) {
            if (!iter.hasNext) { done = true; drain = heap.iterator() }
            else {
              val row = iter.next()
              val key = keyProj(row)
              if (curKey == null || keyOrd.compare(key, curKey) != 0) {
                if (curKey != null) {
                  val closed = heap
                  heap = newHeap()
                  drain = closed.iterator()
                }
                curKey = key.copy()
              }
              insert(heap, row)
            }
          }
        override def hasNext: Boolean = { fill(); drain.hasNext }
        override def next(): InternalRow = {
          fill()
          if (!drain.hasNext) throw new NoSuchElementException("empty iterator")
          drain.next()
        }
      }
      else new Iterator[InternalRow] {
        import scala.jdk.CollectionConverters._
        private val heaps =
          new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
        private var drain: Iterator[InternalRow] = Iterator.empty
        private var done = false
        private def flush(): Unit = {
          val closed = new java.util.ArrayList(heaps.values())
          heaps.clear()
          drain = closed.iterator().asScala.flatMap(_.iterator().asScala)
        }
        private def fill(): Unit =
          while (!drain.hasNext && !done) {
            if (!iter.hasNext) { done = true; flush() }
            else {
              val row = iter.next()
              val key = keyProj(row)
              var heap = heaps.get(key)
              if (heap == null) {
                heap = newHeap()
                heaps.put(key.copy(), heap)
              }
              insert(heap, row)
              if (heaps.size >= flushKeys) flush()
            }
          }
        override def hasNext: Boolean = { fill(); drain.hasNext }
        override def next(): InternalRow = {
          fill()
          if (!drain.hasNext) throw new NoSuchElementException("empty iterator")
          drain.next()
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}
