package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.DataType

/** Identity expression that reports itself non-deterministic.
  *
  * Purpose: a pushdown/collapse fence for expensive, multiply-referenced
  * projections. Catalyst's `PushDownPredicates` substitutes a projected
  * alias into any filter above it, and `CollapseProject` can inline a
  * projection into each use site — for a projected expression referenced k
  * times that means k re-evaluations per row. Wrapping the projected
  * expression (or the validity flag derived from it) in a fence keeps the
  * Project boundary intact, so the expensive expression is evaluated
  * exactly once per row and downstream operators consume the materialized
  * attribute.
  *
  * The wrapped value is still computed by the child expression unchanged —
  * "non-deterministic" is a declaration to the optimizer only. This is the
  * standard workaround for Spark's lack of a first-class "materialize this
  * alias" hint (the same effect is commonly obtained by smuggling a
  * `rand()` column into the projection; the fence avoids the dummy column
  * and the per-row RNG).
  *
  * Scale note: fencing trades optimizer freedom for evaluation count — it
  * also stops predicate pushdown *to the scan* through this projection, so
  * only fence expressions that are genuinely expensive (a regex parse, a
  * crypto hash), and apply source-prunable filters below the fence.
  */
case class OptimizerFence(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "fence"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    ev.copy(code = childGen.code, isNull = childGen.isNull, value = childGen.value)
  }

  override protected def withNewChildInternal(newChild: Expression): OptimizerFence =
    copy(child = newChild)
}

object OptimizerFence {
  def apply(c: Column): Column =
    ColumnBridge.column(OptimizerFence(ColumnBridge.expression(c)))
}
