package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType,
  LongType}

/** Snap a float/double vector to exact int64 at 1e-6 resolution —
  * `floor(x * 1e6 + 0.5)` per component, the engine's standard
  * embedding quantization (Similarity.snapVec).
  *
  * Native sibling of [[DotProductLong]]/[[L2DistanceLong]]: the
  * `transform(c, x => snap(x))` HOF interprets its lambda per
  * COMPONENT, and snapping is the first stage of every y-tier build —
  * dims × |corpus| lambda calls before the quantizer even starts. One
  * loop into a primitive long[] (UnsafeArrayData, no boxing).
  *
  * Null ELEMENTS are rejected loudly (embedding vectors never carry
  * them; the HOF form would have propagated a null component into
  * every downstream dot/L2, which only surfaces as a wrong answer
  * much later). A null ARRAY returns null, standard unary semantics.
  */
case class SnapVecLong(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def elemIsDouble: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"snap_vec requires ARRAY<FLOAT> or ARRAY<DOUBLE>, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i))
        throw new IllegalArgumentException(
          "snap_vec: null vector component at index " + i)
      val x = if (elemIsDouble) arr.getDouble(i) else arr.getFloat(i).toDouble
      out(i) = math.floor(x * 1000000.0 + 0.5).toLong
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      val out = ctx.freshName("out")
      val get = if (elemIsDouble) s"$arr.getDouble" else s"(double) $arr.getFloat"
      s"""
         |int $n = $arr.numElements();
         |long[] $out = new long[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($arr.isNullAt($i)) {
         |    throw new IllegalArgumentException(
         |      "snap_vec: null vector component at index " + $i);
         |  }
         |  double $x = $get($i);
         |  $out[$i] = (long) Math.floor($x * 1000000.0 + 0.5);
         |}
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SnapVecLong =
    copy(child = newChild)
}

object SnapVecLong {
  def snap_vec(c: Column): Column =
    ColumnBridge.column(SnapVecLong(ColumnBridge.expression(c)))
}
