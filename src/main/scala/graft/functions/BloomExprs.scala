package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd Bloom-filter membership over a 64-bit key column.
  *
  * The filter rides the expression as a codegen reference object, so it is
  * serialized into the stage's task binary — which Spark broadcasts ONCE
  * per stage, not once per task — and probed inline inside whole-stage
  * codegen. This is the map-side prefilter shape for "is this train-side
  * key possibly in the (driver-built) reference set": a few-hundred-KB
  * filter stands in for a reference set that would be GBs to broadcast
  * exactly, and survivors flow into an exact verify join (Bloom has no
  * false negatives, so prefilter + exact verify = exact semantics).
  */
object BloomExprs {

  case class BloomMightContainLong(child: Expression, bloom: BloomFilter)
      extends UnaryExpression {

    override def dataType: DataType = BooleanType
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "bloom_might_contain"

    override def nullSafeEval(input: Any): Any =
      bloom.mightContainLong(input.asInstanceOf[Long])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("bloomFilter", bloom, classOf[BloomFilter].getName)
      nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.mightContainLong($v);")
    }

    override protected def withNewChildInternal(newChild: Expression): BloomMightContainLong =
      copy(child = newChild)
  }

  def mightContainLong(key: Column, bloom: BloomFilter): Column =
    ColumnBridge.column(BloomMightContainLong(ColumnBridge.expression(key), bloom))
}
