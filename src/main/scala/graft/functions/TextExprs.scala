package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType, StructField, StructType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** One-pass text-quality statistics kernel.
  *
  * The composed form of the C4-style quality signals costs four regex
  * passes (three of which allocate a full rewritten string per row) plus a
  * split and an INTERPRETED higher-order stopword filter. This expression
  * computes the same six counters in a single pass over the UTF-8 bytes
  * with zero intermediate allocation, and is pinned bit-identical to the
  * composed form by `TextExprsSpec`.
  *
  * Semantics mirrored exactly:
  *   - n_chars   = `length(text)` — UTF-8 code points (bytes not of the
  *                 form 10xxxxxx);
  *   - n_alpha   = matches of `[A-Za-z]` (single-byte, so byte test);
  *   - n_digit   = matches of `[0-9]`;
  *   - n_space   = matches of java-regex `\s` = `[ \t\n\x0B\f\r]` (ASCII);
  *   - n_toks    = `size(split(trim(text), "\\s+"))` — runs of non-ws in
  *                 the trimmed text, EXCEPT that an empty/all-ws input
  *                 yields 1 (Java split returns one empty token there);
  *   - stop_hits = tokens of `lower(text)` equal to one of the stopwords.
  *                 Tokenization is unaffected by lowercasing and the
  *                 stopword list is plain ASCII, so ASCII-lowercased token
  *                 comparison is equivalent (no Unicode mapping produces a
  *                 new pure-ASCII-letter token: the only char that
  *                 case-folds INTO ASCII is U+212A KELVIN SIGN → 'k',
  *                 which no stopword contains).
  */
object TextExprs {

  /** [[Kernels.tryToLongExact]] as an expression: bit-identical to
    * `Cast(child, LongType, EvalMode.TRY)` for string input, minus the
    * per-row SparkNumberFormatException TRY constructs on every reject
    * (the JSONExtractInt first-leg cost — see the kernel's scaladoc).
    */
  case class TryLongExact(child: Expression) extends UnaryExpression {

    override def dataType: DataType = org.apache.spark.sql.types.LongType
    override def nullable: Boolean = true
    override def prettyName: String = "try_long_exact"

    override def nullSafeEval(input: Any): Any =
      Kernels.tryToLongExact(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, s => {
        val res = ctx.freshName("res")
        s"""
           |java.lang.Long $res = graft.functions.Kernels.tryToLongExact($s);
           |if ($res == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = $res.longValue(); }
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): TryLongExact =
      copy(child = newChild)
  }

  val StatsSchema: StructType = StructType(Seq(
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_alpha", IntegerType, nullable = false),
    StructField("n_digit", IntegerType, nullable = false),
    StructField("n_space", IntegerType, nullable = false),
    StructField("n_toks", IntegerType, nullable = false),
    StructField("stop_hits", IntegerType, nullable = false)))

  case class TextQualityStats(child: Expression, stopwords: Seq[String])
      extends UnaryExpression {
    require(stopwords.forall(w => w.nonEmpty && w.forall(c => c < 128 && !c.isUpper)),
      "stopwords must be non-empty lowercase ASCII")

    override def dataType: DataType = StatsSchema
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "text_quality_stats"

    @transient private lazy val stopBytes: Array[Array[Byte]] =
      stopwords.map(_.getBytes("UTF-8")).toArray

    override def nullSafeEval(input: Any): Any =
      Kernels.textQualityStats(input.asInstanceOf[UTF8String], stopBytes)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val words = ctx.addReferenceObj("stopwords", stopBytes, "byte[][]")
      nullSafeCodeGen(ctx, ev, s =>
        s"${ev.value} = graft.functions.Kernels.textQualityStats($s, $words);")
    }

    override protected def withNewChildInternal(newChild: Expression): TextQualityStats =
      copy(child = newChild)
  }

  def textQualityStats(text: Column, stopwords: Seq[String]): Column =
    ColumnBridge.column(TextQualityStats(ColumnBridge.expression(text), stopwords))

  val RepetitionSchema: StructType = StructType(Seq(
    StructField("n_toks", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("top1", IntegerType, nullable = false),
    StructField("top2", IntegerType, nullable = false),
    StructField("top3", IntegerType, nullable = false)))

  /** Per-row repetition counters over NORMALIZED text — replaces three
    * explode + double-aggregate + join rounds (six shuffles of raw gram
    * rows) with one map-side kernel call: the Gopher repetition signals
    * become a pure scan-speed projection at any corpus size. Equivalence
    * to the exploded composition is pinned by `TextExprsSpec`.
    */
  case class RepetitionStats(child: Expression) extends UnaryExpression {

    override def dataType: DataType = RepetitionSchema
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "repetition_stats"

    override def nullSafeEval(input: Any): Any =
      Kernels.repetitionStats(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, s =>
        s"${ev.value} = graft.functions.Kernels.repetitionStats($s);")

    override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
      copy(child = newChild)
  }

  def repetitionStats(normalizedText: Column): Column =
    ColumnBridge.column(RepetitionStats(ColumnBridge.expression(normalizedText)))
}
