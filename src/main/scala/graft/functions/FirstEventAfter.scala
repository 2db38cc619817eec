package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType,
  StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `min(ts | type == wanted && ts > after)` over an array of
  * `struct<ts: long, t: string>` events — the funnel-stage primitive
  * (a11_funnel / StreamFunnel's batch form).
  *
  * A native codegen Expression instead of
  * `array_min(transform(filter(evs, e => e.t === w && e.ts > a), _.ts))`:
  * higher-order-function lambdas are interpreted per ELEMENT (the
  * DotProductLong lesson — they were the pairwise-scan bottleneck), and
  * the HOF chain allocates two intermediate arrays per stage per row.
  * This is one allocation-free loop over the event structs with a
  * binary UTF8String equality; the three funnel stages are three such
  * loops instead of nine interpreted array passes.
  *
  * Null semantics carry the stage CHAIN: standard null-intolerant
  * inputs mean a null `after` (the previous stage was never reached)
  * nulls this stage too — exactly the funnel contract — and the first
  * stage passes `Long.MinValue` as its `after`. A non-null input with
  * no qualifying event returns null ("stage not reached"). Null array
  * ELEMENTS are skipped, never dereferenced.
  */
case class FirstEventAfter(events: Expression, wanted: Expression,
                           after: Expression) extends TernaryExpression {

  override def first: Expression = events
  override def second: Expression = wanted
  override def third: Expression = after

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (events.dataType, wanted.dataType, after.dataType) match {
      case (ArrayType(s: StructType, _), StringType, LongType)
          if s.length == 2 && s(0).dataType == LongType &&
             s(1).dataType == StringType =>
        TypeCheckResult.TypeCheckSuccess
      case (e, w, a) =>
        TypeCheckResult.TypeCheckFailure(
          "first_event_after requires (ARRAY<STRUCT<ts: BIGINT, t: STRING>>, " +
            s"STRING, BIGINT), got ($e, $w, $a)")
    }

  override def nullSafeEval(ev: Any, w: Any, a: Any): Any = {
    val arr = ev.asInstanceOf[ArrayData]
    val want = w.asInstanceOf[UTF8String]
    val lo = a.asInstanceOf[Long]
    val n = arr.numElements()
    var best = Long.MaxValue
    var found = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val row = arr.getStruct(i, 2)
        if (!row.isNullAt(0) && !row.isNullAt(1)) {
          val ts = row.getLong(0)
          if (ts > lo && ts < best && row.getUTF8String(1).equals(want)) {
            best = ts; found = true
          }
        }
      }
      i += 1
    }
    if (found) best else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (arr, want, lo) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val row = ctx.freshName("row")
      val ts = ctx.freshName("ts")
      val best = ctx.freshName("best")
      val found = ctx.freshName("found")
      s"""
         |int $n = $arr.numElements();
         |long $best = Long.MAX_VALUE;
         |boolean $found = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    org.apache.spark.sql.catalyst.InternalRow $row = $arr.getStruct($i, 2);
         |    if (!$row.isNullAt(0) && !$row.isNullAt(1)) {
         |      long $ts = $row.getLong(0);
         |      if ($ts > $lo && $ts < $best &&
         |          $row.getUTF8String(1).equals($want)) {
         |        $best = $ts; $found = true;
         |      }
         |    }
         |  }
         |}
         |if ($found) { ${ev.value} = $best; } else { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): FirstEventAfter =
    copy(events = newFirst, wanted = newSecond, after = newThird)
}

object FirstEventAfter {
  def first_event_after(events: Column, wanted: Column, after: Column): Column =
    ColumnBridge.column(FirstEventAfter(
      ColumnBridge.expression(events),
      ColumnBridge.expression(wanted),
      ColumnBridge.expression(after)))
}
