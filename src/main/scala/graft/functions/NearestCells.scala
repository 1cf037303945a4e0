package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Map-only multi-probe cell assignment for IVF-style blocking: for each
  * `array<double>` vector, the ids of its `nProbe` nearest centroids by
  * cosine (descending, ties to the smaller centroid id).
  *
  * The centroid matrix is captured driver-side at plan time and ships as
  * a codegen reference object — the same bounded-driver-state pattern as
  * the Bloom-filter build ([[BloomExprs]]): centroids ≪ corpus by
  * construction, so this is kilobytes-to-megabytes, and assignment then
  * costs ZERO shuffle at any corpus size (the per-row loop is
  * O(centroids × dim) inside compiled code).
  */
case class NearestCells(child: Expression, assigner: CellAssigner)
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_cells requires array<double>, got $other")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "nearest_cells"

  override def nullSafeEval(input: Any): Any =
    assigner.assign(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cellAssigner", assigner, classOf[CellAssigner].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = $ref.assign($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCells =
    copy(child = newChild)
}

object NearestCells {
  def apply(v: Column, centIds: Array[Long], cents: Array[Array[Double]],
      nProbe: Int): Column =
    ColumnBridge.column(NearestCells(ColumnBridge.expression(v),
      new CellAssigner(centIds, cents, nProbe)))
}

/** The compiled assignment kernel (Serializable; ships inside the plan). */
final class CellAssigner(
    centIds: Array[Long], cents: Array[Array[Double]], nProbe: Int)
    extends Serializable {
  require(centIds.length == cents.length && cents.nonEmpty && nProbe >= 1)

  private val norms: Array[Double] =
    cents.map(c => math.sqrt(c.map(x => x * x).sum))

  /** Top-`nProbe` centroid ids by cosine desc, centroid id asc on ties. */
  def assign(v: ArrayData): ArrayData = {
    val dim = v.numElements()
    var vn = 0.0
    var vi = 0
    while (vi < dim) { val x = v.getDouble(vi); vn += x * x; vi += 1 }
    vn = math.sqrt(vn)
    // a zero-norm vector has NaN cosine to everything — the exact path
    // would never pair it (NaN >= t is false), so it probes no cells
    if (vn == 0.0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val k = math.min(nProbe, cents.length)
    val bestIds = new Array[Long](k)
    val bestCos = new Array[Double](k)
    java.util.Arrays.fill(bestCos, Double.NegativeInfinity)
    var filled = 0
    var c = 0
    while (c < cents.length) {
      val cv = cents(c)
      val n = math.min(dim, cv.length)
      var dot = 0.0
      var i = 0
      while (i < n) { dot += v.getDouble(i) * cv(i); i += 1 }
      val cos = dot / (vn * norms(c))
      // a NaN cosine (zero-norm or NaN centroid) can never be "nearest";
      // skipping it explicitly also keeps unfilled slots from surfacing as
      // a phantom centroid id 0
      if (cos == cos) {
        // insertion into the tiny top-k (ordered best-first); ties prefer
        // the smaller centroid id, matching the window/argmax convention
        var pos = k
        while (pos > 0 && (bestCos(pos - 1) < cos ||
          (bestCos(pos - 1) == cos && bestIds(pos - 1) > centIds(c)))) pos -= 1
        if (pos < k) {
          var j = k - 1
          while (j > pos) { bestCos(j) = bestCos(j - 1); bestIds(j) = bestIds(j - 1); j -= 1 }
          bestCos(pos) = cos
          bestIds(pos) = centIds(c)
          if (filled < k) filled += 1
        }
      }
      c += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (filled == k) bestIds else java.util.Arrays.copyOf(bestIds, filled))
  }
}
