package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Map-only BPE encoding: whitespace-split the (already normalized) text,
  * apply the learned merge list to every word, emit the subword tokens.
  *
  * The merge list is captured driver-side at plan time and ships as a
  * codegen reference object — the bounded-driver-state pattern of
  * [[NearestCells]]/[[BloomExprs]]: a merge table is O(vocab budget)
  * (32k rules ≈ kilobytes), so encoding costs ZERO shuffle at any corpus
  * size and pipelines into the scan.
  */
case class BpeEncode(child: Expression, encoder: BpeEncoder)
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bpe_encode requires string, got $other")
    }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  override def nullSafeEval(input: Any): Any =
    encoder.encode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncoder", encoder, classOf[BpeEncoder].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.encode($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

object BpeEncode {
  def apply(text: Column, encoder: BpeEncoder): Column =
    ColumnBridge.column(BpeEncode(ColumnBridge.expression(text), encoder))
}

/** The compiled encode kernel (Serializable; ships inside the plan).
  *
  * Applies the merges SEQUENTIALLY IN LEARNED ORDER, each as one
  * left-to-right non-overlapping pass — bit-identical to the training
  * fold in [[graft.operators.Bpe.train]], so re-encoding the training
  * corpus reproduces the training-end symbol state exactly (that identity
  * is what the t18 roundtrip/compression self-checks lean on). Cost is
  * O(|merges| × |word|) per word; a production-size 32k-rule table would
  * swap in the rank-priority-queue application (same results on any
  * sequence reachable from the same training run) without changing the
  * plan shape.
  */
final class BpeEncoder(p1s: Array[String], p2s: Array[String])
    extends Serializable {
  require(p1s.length == p2s.length, "merge halves must align")
  private val merged: Array[String] =
    Array.tabulate(p1s.length)(i => p1s(i) + p2s(i))

  def encode(text: UTF8String): ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    val words = text.toString.split(' ')
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      if (w.nonEmpty) {
        // char split by code unit — the same contract as split(w, '')
        // training uses; both sides treat surrogate pairs identically
        var syms: Array[String] = {
          val a = new Array[String](w.length)
          var i = 0
          while (i < w.length) { a(i) = String.valueOf(w.charAt(i)); i += 1 }
          a
        }
        var r = 0
        while (r < p1s.length) {
          if (syms.length > 1) {
            val p1 = p1s(r); val p2 = p2s(r)
            val buf = new scala.collection.mutable.ArrayBuffer[String](syms.length)
            var i = 0
            while (i < syms.length) {
              if (buf.nonEmpty && buf.last == p1 && syms(i) == p2)
                buf(buf.length - 1) = merged(r)
              else buf += syms(i)
              i += 1
            }
            if (buf.length < syms.length) syms = buf.toArray
          }
          r += 1
        }
        var i = 0
        while (i < syms.length) { out += UTF8String.fromString(syms(i)); i += 1 }
      }
      wi += 1
    }
    new GenericArrayData(out.toArray[Any])
  }
}
