package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** Byte-pack an ARRAY<BIGINT> of small codes (each in [0, 255]) into a
  * BINARY column — the storage form of a quantized-vector index: one
  * SQ8 code per dimension is 64 B for a 64-dim vector (vs 512 B as
  * int64s, the 8× cut), one PQ code per subspace is nSub bytes. The
  * scan payload of an ADC query is exactly this column, so the packing
  * factor is the scan-cost factor at 100 TB.
  *
  * A code outside [0, 255] or a null element fails LOUDLY — silent
  * truncation (`(byte) x`) would corrupt every downstream distance by
  * an unbounded amount and surface only as bad recall much later.
  * Null array returns null (standard unary semantics).
  *
  * [[UnpackBytesLong]] is the exact inverse (bytes read back unsigned),
  * so pack∘unpack is the identity on valid inputs — spec-asserted. */
case class PackBytesLong(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pack_bytes requires ARRAY<BIGINT>, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i))
        throw new IllegalArgumentException(
          "pack_bytes: null code at index " + i)
      val v = arr.getLong(i)
      if (v < 0L || v > 255L)
        throw new IllegalArgumentException(
          "pack_bytes: code out of [0,255] at index " + i + ": " + v)
      out(i) = v.toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      val out = ctx.freshName("out")
      s"""
         |int $n = $arr.numElements();
         |byte[] $out = new byte[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($arr.isNullAt($i)) {
         |    throw new IllegalArgumentException(
         |      "pack_bytes: null code at index " + $i);
         |  }
         |  long $v = $arr.getLong($i);
         |  if ($v < 0L || $v > 255L) {
         |    throw new IllegalArgumentException(
         |      "pack_bytes: code out of [0,255] at index " + $i + ": " + $v);
         |  }
         |  $out[$i] = (byte) $v;
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PackBytesLong =
    copy(child = newChild)
}

object PackBytesLong {
  def pack_bytes(c: Column): Column =
    ColumnBridge.column(PackBytesLong(ColumnBridge.expression(c)))
}

/** Inverse of [[PackBytesLong]]: BINARY → ARRAY<BIGINT>, each byte read
  * UNSIGNED (0..255 — codes, not two's-complement numbers). One loop
  * into a primitive long[] (UnsafeArrayData, no boxing), fully
  * codegen'd, so the decode stays inside whole-stage codegen on the
  * index read path. */
case class UnpackBytesLong(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"unpack_bytes requires BINARY, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val out = new Array[Long](bytes.length)
    var i = 0
    while (i < bytes.length) {
      out(i) = java.lang.Byte.toUnsignedLong(bytes(i))
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bin => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      s"""
         |int $n = $bin.length;
         |long[] $out = new long[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = (long) ($bin[$i] & 0xFF);
         |}
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): UnpackBytesLong =
    copy(child = newChild)
}

object UnpackBytesLong {
  def unpack_bytes(c: Column): Column =
    ColumnBridge.column(UnpackBytesLong(ColumnBridge.expression(c)))
}

/** Fused SQ8 decode: packed BINARY codes + per-dimension (mn, span)
  * stats → dequantized ARRAY<BIGINT>, dv_i = mn_i + code_i·span_i div
  * 255, in ONE native loop.
  *
  * Exists because the composable form — unpack_bytes then a
  * `transform(c, (x, i) -> ...)` — pays Spark's higher-order-function
  * machinery per COMPONENT (HOFs interpret their lambda; they are not
  * whole-stage-codegen'd): measured at 500k×64-dim, scan+dequantize+
  * norm was 0.62 s via the HOF vs 0.40 s with no dequantize at all —
  * the lambda was most of the query. This expression is the same
  * arithmetic as the HOF (exact int64; code and span are non-negative
  * so Java `/` equals floor div here) in a primitive long[] loop,
  * codegen'd, so the decode rides inside whole-stage codegen like
  * SnapVecLong does on the encode side.
  *
  * The stats children are in practice foldable array literals (they
  * come from the index sidecar — CodesIndex.sq8Dequantized); arbitrary
  * columns work but would re-read per row. Null codes array → null;
  * stats shorter than the codes fail loudly (a truncated sidecar must
  * never silently zero-extend). */
case class Sq8DecodeLong(codes: Expression, mn: Expression, span: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def first: Expression = codes
  override def second: Expression = mn
  override def third: Expression = span

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (codes.dataType, mn.dataType, span.dataType) match {
      case (BinaryType, ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"sq8_decode requires (BINARY, ARRAY<BIGINT>, ARRAY<BIGINT>), got $other")
    }

  override def nullSafeEval(c: Any, m: Any, s: Any): Any = {
    val bytes = c.asInstanceOf[Array[Byte]]
    val mnA = m.asInstanceOf[ArrayData]
    val spA = s.asInstanceOf[ArrayData]
    if (mnA.numElements() < bytes.length || spA.numElements() < bytes.length)
      throw new IllegalArgumentException(
        s"sq8_decode: ${bytes.length} codes but stats cover only " +
          s"${math.min(mnA.numElements(), spA.numElements())} dims")
    val out = new Array[Long](bytes.length)
    var i = 0
    while (i < bytes.length) {
      out(i) = mnA.getLong(i) +
        java.lang.Byte.toUnsignedLong(bytes(i)) * spA.getLong(i) / 255L
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (bin, mnA, spA) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      s"""
         |int $n = $bin.length;
         |if ($mnA.numElements() < $n || $spA.numElements() < $n) {
         |  throw new IllegalArgumentException(
         |    "sq8_decode: " + $n + " codes but stats cover only " +
         |    Math.min($mnA.numElements(), $spA.numElements()) + " dims");
         |}
         |long[] $out = new long[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = $mnA.getLong($i)
         |    + ((long) ($bin[$i] & 0xFF)) * $spA.getLong($i) / 255L;
         |}
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Sq8DecodeLong =
    copy(codes = newFirst, mn = newSecond, span = newThird)
}

object Sq8DecodeLong {
  def sq8_decode(codes: Column, mn: Column, span: Column): Column =
    ColumnBridge.column(Sq8DecodeLong(ColumnBridge.expression(codes),
      ColumnBridge.expression(mn), ColumnBridge.expression(span)))
}
