package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of codepoints NOT in `[a-zA-Z0-9\s]` — exactly what
  * `length(s) - length(regexp_replace(s, "[^a-zA-Z0-9\\s]", ""))`
  * computes (both engines' `length` counts codepoints; `\s` is the
  * ASCII whitespace class), but as a single pass over the UTF-8 bytes
  * instead of a regex engine building a stripped copy of every row just
  * to measure it. Non-ASCII codepoints count as punctuation (they match
  * `[^a-zA-Z0-9\s]`); continuation bytes are skipped so multi-byte
  * codepoints count once.
  *
  * Native codegen Expression, same pattern as RollingHash — measured
  * ~5x over the regexp_replace form on the documents corpus.
  */
case class PunctCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"punct_count requires STRING, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].getBytes
    var cnt = 0L
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      if (b < 0x80) { // ASCII codepoint
        val alnum = (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
          (b >= '0' && b <= '9')
        val ws = b == ' ' || b == '\t' || b == '\n' || b == 0x0b ||
          b == '\f' || b == '\r'
        if (!alnum && !ws) cnt += 1
      } else if ((b & 0xc0) != 0x80) { // non-ASCII start byte
        cnt += 1
      } // continuation bytes: skip
      i += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val cnt = ctx.freshName("cnt")
      val alnum = ctx.freshName("alnum")
      val ws = ctx.freshName("ws")
      // NOTE: Spark's Block interpolator stripMargin-processes emitted
      // code at every nesting level, so no emitted line may START with
      // '|' — a leading `|| (...)` continuation gets its pipes eaten and
      // the survivor parses as a Janino cast ("expression is not a
      // type"), silently demoting the whole operator to interpreted
      // mode. Keep boolean chains on one line.
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $cnt = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  int $b = $bytes[$i] & 0xff;
         |  if ($b < 0x80) {
         |    boolean $alnum = ($b >= 'a' && $b <= 'z') || ($b >= 'A' && $b <= 'Z') || ($b >= '0' && $b <= '9');
         |    boolean $ws = $b == ' ' || $b == '\\t' || $b == '\\n' || $b == 0x0b || $b == '\\f' || $b == '\\r';
         |    if (!$alnum && !$ws) $cnt++;
         |  } else if (($b & 0xc0) != 0x80) {
         |    $cnt++;
         |  }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PunctCount =
    copy(child = newChild)
}

object PunctCount {
  /** Column-level entry point: `punct_count(text)`. */
  def punct_count(c: Column): Column =
    ColumnBridge.column(PunctCount(ColumnBridge.expression(c)))

  /** Regex reference for tests (the expression this one replaces). */
  def reference(s: String): Long =
    s.codePointCount(0, s.length) -
      s.replaceAll("[^a-zA-Z0-9\\s]", "").codePointCount(0,
        s.replaceAll("[^a-zA-Z0-9\\s]", "").length)
}
