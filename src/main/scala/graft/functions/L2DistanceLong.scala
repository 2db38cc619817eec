package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Exact int64 squared-L2 distance of two long arrays — the quantizer
  * hot-path primitive ([[DotProductLong]]'s sibling; same motivation,
  * same shape).
  *
  * Every k-means assignment, PQ encode, ADC table build, and IVF-PQ
  * refine computes `sum((x-y)^2)` over snapped vectors; the
  * `aggregate(zip_with(...))` form interprets its lambdas per ELEMENT
  * and allocates the zipped array per pair — and the quantizer builds
  * run it |vectors|·K times, which is exactly what made y11
  * quantizer-BOUND in the decade probes. One tight primitive loop,
  * identical exact-int64 results (oracle hashes unchanged by
  * construction).
  *
  * Length contract: the two arrays MUST have equal length — snapped
  * embedding dims are an invariant of the quantizer tier, so a
  * mismatch means a wiring bug (wrong column, stale index), and the
  * replaced `aggregate(zip_with(...))` form surfaced it as a null.
  * Truncating to the shorter array would instead return a plausible
  * distance and surface the bug much later as a wrong ranking, so
  * this fails loudly at eval time instead.
  */
case class L2DistanceLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"l2_long requires ARRAY<BIGINT> inputs, got $l, $r")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) throw new IllegalArgumentException(
      s"l2_long: array length mismatch ($n vs ${y.numElements()})")
    var acc = 0L
    var i = 0
    while (i < n) {
      val d = x.getLong(i) - y.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  throw new IllegalArgumentException(
         |    "l2_long: array length mismatch (" + $n + " vs " + $b.numElements() + ")");
         |}
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $d = $a.getLong($i) - $b.getLong($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): L2DistanceLong =
    copy(left = newLeft, right = newRight)
}

object L2DistanceLong {
  def l2_long(a: Column, b: Column): Column =
    ColumnBridge.column(
      L2DistanceLong(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
