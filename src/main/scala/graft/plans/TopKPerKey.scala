package graft.plans

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, UnaryNode, Window => LogicalWindow, WindowGroupLimit}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** Whole-operator Catalyst extension: top-k rows per key.
  *
  * The declarative form — `row_number().over(partitionBy(key).orderBy(o))`
  * then `filter(rn <= k)` — is the idiom every "top 3 per supplier" query
  * uses, and stock Spark executes it by FULLY SORTING every key group
  * (WindowExec requires [key, o]-sorted input), then numbering and
  * discarding all but k rows. At 100 TB with millions of rows per key and
  * k in the tens, almost all of that sort is wasted work.
  *
  * Since 3.5 stock Spark already prunes part of this via
  * `InferWindowGroupLimit`: it inserts map-side and reduce-side
  * `WindowGroupLimit`s that cap each group at k DURING a sort — but both
  * sides still SORT their input (O(n log n) over every incoming row) and
  * the reduce side still runs the full window operator over the
  * survivors. This extension replaces sorting with heaps end to end:
  *   - [[TopKPerKeyRewrite]] (optimizer rule) pattern-matches exactly
  *     `Filter(rn <= lit, Window(row_number over (part, order)))`,
  *     drops the now-redundant logical `WindowGroupLimit` if the stock
  *     rule already inserted one, and plants the [[TopKPerKey]] node;
  *   - [[TopKPerKeyStrategy]] plans TWO [[TopKPerKeyExec]] phases around
  *     the key exchange (mirroring partial/final aggregation): the
  *     partial phase heaps each map partition down to ≤k rows per key
  *     before anything shuffles (same shuffle volume as stock's partial
  *     WindowGroupLimit, but O(n log k) heap pushes instead of an
  *     O(n log n) sort), and the final phase re-heaps the ≤k·partitions
  *     survivors per key and emits each heap in order with the
  *     row_number attached under the original expression id, so
  *     downstream operators resolve unchanged. No sort node exists
  *     anywhere in the plan.
  *
  * Correctness gate: catalog query q39 runs the REWRITTEN plan and
  * hash-matches the DuckDB window oracle; the spec additionally pins
  * rewrite-fires / rewrite-declines cases and result equality with the
  * unrewritten window form. Measured vs stock with `graft.TopKCompare`
  * (interleaved min-of-5, sf0.1 lineitem, 1000 supplier keys): 2.65×
  * at k=3, 1.64× at k=100.
  *
  * The rewrite declines (leaving the stock window plan) when: the rank is
  * not `row_number` (rank/dense_rank admit >k survivors on ties), the
  * partition is empty (global top-k — `TakeOrderedAndProject` already
  * covers it), the bound is non-literal, or k > [[TopKPerKey.MaxK]]
  * (heap memory is k per key; a huge k is better served by the sort).
  */
object TopKPerKey {

  val MaxK = 4096

  /** Partial-phase memory bound: a map partition stops opening NEW per-key
    * heaps once the worst-case retained rows (tracked keys × k) would pass
    * this, and rows for untracked keys flow straight through to the
    * exchange instead (correct — the final phase recomputes exact top-k;
    * the partial phase is only a shuffle thinner). Without the cap, a
    * high-cardinality key column retains k·distinct-keys rows per
    * partition with no spill, where stock sort-based WindowGroupLimit
    * would have spilled. Var (not val) so the fallback spec can exercise
    * the degraded path at a tiny bound.
    */
  @volatile var MaxPartialRows: Long = 4L << 20

  /** Idempotently install the rewrite + strategy into a live session
    * (`experimental` hooks bind at query planning, not session build).
    */
  def install(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraOptimizations.exists(_ eq TopKPerKeyRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ TopKPerKeyRewrite
    if (!spark.experimental.extraStrategies.exists(_ eq TopKPerKeyStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
  }
}

/** Logical node: the top `k` rows per `partExprs` group under `orderSpec`,
  * with the original row_number output re-emitted as `rnAttr`.
  */
case class TopKPerKey(
    partExprs: Seq[Expression],
    orderSpec: Seq[SortOrder],
    k: Int,
    rnAttr: Attribute,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rnAttr
  override def producedAttributes: AttributeSet = AttributeSet(rnAttr)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** `Filter(rn <= k, Window(rn = row_number() over (part, order)))` →
  * [[TopKPerKey]]. Runs with the user-provided optimizer batch (after
  * predicate pushdown has settled; a row_number predicate never pushes
  * through its own window, so the adjacency is stable).
  */
object TopKPerKeyRewrite extends Rule[LogicalPlan] {
  def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, w: LogicalWindow)
        if w.windowExpressions.size == 1 && w.partitionSpec.nonEmpty =>
      w.windowExpressions.head match {
        case a @ Alias(WindowExpression(_: RowNumber, _), _) =>
          val kOpt = cond match {
            case LessThanOrEqual(attr: AttributeReference, Literal(k: Int, IntegerType))
                if attr.exprId == a.exprId => Some(k)
            case LessThan(attr: AttributeReference, Literal(k: Int, IntegerType))
                if attr.exprId == a.exprId => Some(k - 1)
            // rn = 1 ⟺ rn <= 1 (row_number is dense from 1); only the
            // 1-case of equality is a top-k — `rn = 3` alone is not
            case EqualTo(attr: AttributeReference, Literal(1, IntegerType))
                if attr.exprId == a.exprId => Some(1)
            case EqualTo(Literal(1, IntegerType), attr: AttributeReference)
                if attr.exprId == a.exprId => Some(1)
            case _ => None
          }
          kOpt match {
            case Some(k) if k > 0 && k <= TopKPerKey.MaxK =>
              // InferWindowGroupLimit (stock, 3.5+) may already have
              // inserted its group-limit below this window; the heap
              // operator subsumes it, so plant on ITS child
              val child = w.child match {
                case wgl: WindowGroupLimit if wgl.limit >= k => wgl.child
                case c => c
              }
              TopKPerKey(w.partitionSpec, w.orderSpec, k, a.toAttribute, child)
            case _ => f
          }
        case _ => f
      }
  }
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(part, order, k, rn, child) =>
      // two phases around the key exchange, like partial/final aggregation:
      // map-side heaps cap shuffle volume at k rows per key per partition
      val partial = TopKPerKeyExec(part, order, k, rnAttr = None, planLater(child))
      TopKPerKeyExec(part, order, k, rnAttr = Some(rn), partial) :: Nil
    case _ => Nil
  }
}

/** Physical top-k per key. Final phase (`rnAttr = Some`): requires
  * clustering on the key (the planner inserts the same hash exchange the
  * window operator would have needed) and emits row numbers. Partial
  * phase (`rnAttr = None`): no distribution requirement — runs on raw map
  * partitions and only thins them. Either way: one pass pushing rows into
  * a size-k bounded heap per key (max-heap under the reversed order, so
  * a new row enters only by evicting a larger head), NO sort of the
  * input ever happens.
  */
case class TopKPerKeyExec(
    partExprs: Seq[Expression],
    orderSpec: Seq[SortOrder],
    k: Int,
    rnAttr: Option[Attribute],
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output ++ rnAttr
  override def producedAttributes: AttributeSet = AttributeSet(rnAttr.toSeq)
  override def requiredChildDistribution: Seq[Distribution] =
    (if (rnAttr.isDefined) ClusteredDistribution(partExprs) else UnspecifiedDistribution) :: Nil
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"))

  protected override def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val emitRn = rnAttr.isDefined
    val numOutput = longMetric("numOutputRows")
    val maxPartialRows = TopKPerKey.MaxPartialRows
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(partExprs, childOutput)
      val ord: Ordering[InternalRow] = GenerateOrdering.generate(orderSpec, childOutput)
      val heaps = new java.util.LinkedHashMap[InternalRow, java.util.PriorityQueue[InternalRow]]()
      if (!emitRn) {
        // Partial phase, fully streaming: thin rows of TRACKED keys through
        // bounded heaps; once worst-case retained rows (tracked-keys × k)
        // would pass the cap, rows of further keys PASS THROUGH to the
        // exchange unthinned — memory stays bounded at any key cardinality
        // and the final phase is exact either way. (A row a heap evicts is
        // provably outside its key's top-k: k better rows coexist in this
        // partition.) Survivor order is irrelevant — the final phase
        // re-heaps.
        val maxKeys = math.max(1L, maxPartialRows / math.max(1, k))
        new Iterator[InternalRow] {
          private var pending: InternalRow = _
          private var drained: Iterator[InternalRow] = _
          private def pull(): Unit = {
            while (pending == null && drained == null) {
              if (iter.hasNext) {
                val row = iter.next()
                val key = keyProj(row)
                var heap = heaps.get(key)
                if (heap == null && heaps.size() < maxKeys) {
                  heap = new java.util.PriorityQueue[InternalRow](k, ord.reverse)
                  heaps.put(key.copy(), heap)
                }
                if (heap == null) pending = row // beyond the key cap
                else if (heap.size < k) heap.offer(row.copy())
                else if (ord.lt(row, heap.peek())) { heap.poll(); heap.offer(row.copy()) }
              } else {
                drained = heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
              }
            }
          }
          override def hasNext: Boolean = {
            pull(); pending != null || drained.hasNext
          }
          override def next(): InternalRow = {
            pull()
            numOutput += 1
            if (pending != null) { val r = pending; pending = null; r }
            else drained.next()
          }
        }
      } else {
        while (iter.hasNext) {
          val row = iter.next()
          val key = keyProj(row)
          var heap = heaps.get(key)
          if (heap == null) {
            heap = new java.util.PriorityQueue[InternalRow](k, ord.reverse)
            heaps.put(key.copy(), heap)
          }
          if (heap.size < k) heap.offer(row.copy())
          else if (ord.lt(row, heap.peek())) { heap.poll(); heap.offer(row.copy()) }
        }
        val outProj = UnsafeProjection.create(output, childOutput ++ rnAttr)
        val rnRow = new GenericInternalRow(1)
        val joined = new JoinedRow
        heaps.values().iterator().asScala.flatMap { heap =>
          val arr = heap.toArray(new Array[InternalRow](heap.size)).sorted(ord)
          arr.iterator.zipWithIndex.map { case (r, i) =>
            rnRow.setInt(0, i + 1)
            numOutput += 1
            outProj(joined(r, rnRow))
          }
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}
