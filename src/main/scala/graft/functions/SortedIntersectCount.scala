package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Count of common elements of two SORTED, DISTINCT, null-free string
  * arrays — the Jaccard-verify hot-path primitive (d3/d7/d8's verify
  * stage runs it once per candidate pair).
  *
  * A native codegen Expression instead of `size(array_intersect(a, b))`:
  * ArrayIntersect builds a hash map over one side for EVERY row — per
  * candidate pair, ~|sh| UTF8String hashes plus map allocations, which
  * made the verify stage allocation-bound (the replica corpus grows
  * true pairs ~963x at 10x data, so the per-pair constant is what
  * scales). On pre-sorted inputs (one sort_array per doc, amortized
  * over all pairs the doc appears in) the intersection count is a
  * single allocation-free merge pass of binary UTF8String compares.
  *
  * Preconditions (callers: Dedup.shingleFrame, DedupQueries.ngramJaccard):
  * both arrays ascending-sorted (sort_array / UTF8String binary order)
  * with distinct elements. Unsorted input returns an undercount rather
  * than an error — keep the sort next to the array_distinct that feeds
  * this. Null ELEMENTS are skipped (never counted as common, never
  * dereferenced): the declared input type is ARRAY<STRING> with
  * containsNull unrestricted, so a future caller handing an array that
  * merely admits nulls must not NPE the merge loop.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"sorted_intersect_count requires ARRAY<STRING> inputs, got $l, $r")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var acc = 0L
    while (i < nx && j < ny) {
      if (x.isNullAt(i)) i += 1
      else if (y.isNullAt(j)) j += 1
      else {
        val c = x.getUTF8String(i).compareTo(y.getUTF8String(j))
        if (c == 0) { acc += 1L; i += 1; j += 1 }
        else if (c < 0) i += 1
        else j += 1
      }
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val acc = ctx.freshName("acc")
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $i = 0; int $j = 0;
         |long $acc = 0L;
         |while ($i < $nx && $j < $ny) {
         |  if ($a.isNullAt($i)) { $i++; }
         |  else if ($b.isNullAt($j)) { $j++; }
         |  else {
         |    int $c = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |    if ($c == 0) { $acc++; $i++; $j++; }
         |    else if ($c < 0) { $i++; } else { $j++; }
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  def sorted_intersect_count(a: Column, b: Column): Column =
    ColumnBridge.column(
      SortedIntersectCount(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
