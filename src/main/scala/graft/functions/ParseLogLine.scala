package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass log-line parser: applies the (template-compiled) anchored regex
  * ONCE per line and returns every capture group as `array<string>`, or
  * NULL when the line does not match the format.
  *
  * Why a custom Catalyst expression: the composable alternative is
  * `value RLIKE fmt` + one `regexp_extract(value, fmt, i)` per field — N+1
  * full regex executions per line (the reference parses each line exactly
  * once, `pkg/nginx/template.go:22-37`). This expression restores the
  * one-pass cost model while staying inside whole-stage codegen: it
  * generates Java that holds the compiled `Pattern` in a reference object,
  * so per-row work is a single `matcher.matches()` plus group copies.
  *
  * Semantics parity with the built-in pair:
  *   - non-matching line → NULL row (caller filters, or routes to the
  *     dead-letter sink — drop-on-mismatch, `pkg/nginx/template.go:30-33`);
  *   - a matched-but-empty group → "" (same as `regexp_extract`), never a
  *     NULL element.
  */
case class ParseLogLine(child: Expression, regex: String)
    extends UnaryExpression {

  @transient private lazy val pattern: Pattern = Pattern.compile(regex)
  private val numGroups: Int = Pattern.compile(regex).matcher("").groupCount()

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"parse_log_line requires a string column, got ${child.dataType}")
    }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "parse_log_line"

  override def nullSafeEval(input: Any): Any = {
    val m = pattern.matcher(input.toString)
    if (!m.matches()) {
      null
    } else {
      val arr = new Array[Any](numGroups)
      var i = 0
      while (i < numGroups) {
        val g = m.group(i + 1)
        arr(i) = UTF8String.fromString(if (g == null) "" else g)
        i += 1
      }
      new GenericArrayData(arr)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val patternRef =
      ctx.addReferenceObj("parseLogLinePattern", pattern, classOf[Pattern].getName)
    val arrayData = classOf[GenericArrayData].getName
    val utf8 = classOf[UTF8String].getName
    nullSafeCodeGen(ctx, ev, subject => {
      val m = ctx.freshName("matcher")
      val arr = ctx.freshName("groups")
      val i = ctx.freshName("i")
      val g = ctx.freshName("g")
      s"""
         |java.util.regex.Matcher $m = $patternRef.matcher($subject.toString());
         |if ($m.matches()) {
         |  Object[] $arr = new Object[$numGroups];
         |  for (int $i = 0; $i < $numGroups; $i++) {
         |    String $g = $m.group($i + 1);
         |    $arr[$i] = $utf8.fromString($g == null ? "" : $g);
         |  }
         |  ${ev.value} = new $arrayData($arr);
         |} else {
         |  ${ev.isNull} = true;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): ParseLogLine =
    copy(child = newChild)
}

object ParseLogLine {
  /** Column API: `parseLogLine($"value", tpl.regex)` → `array<string>` of
    * the capture groups, NULL on format mismatch.
    */
  def apply(value: Column, regex: String): Column =
    ColumnBridge.column(ParseLogLine(ColumnBridge.expression(value), regex))
}
