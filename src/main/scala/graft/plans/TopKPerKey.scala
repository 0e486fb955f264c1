package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, UnaryNode, Window}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator Catalyst extension: top-k per key.
  *
  * `filter(row_number().over(partitionBy(p).orderBy(o)) <= k)` is the
  * idiomatic DataFrame spelling of "k best rows per key" (ANN ranking,
  * top-customers, dedup keep-first), but Spark executes it as a full
  * sort of every key group — at 100 TB that is a giant sort whose
  * output is then almost entirely discarded. This extension rewrites
  * the pattern (optimizer `Rule[LogicalPlan]`) into a dedicated
  * operator (`SparkStrategy` + `SparkPlan`) that keeps a bounded
  * k-element heap per key: a partial pass BEFORE the shuffle cuts each
  * map partition to ≤k rows per key (the groupBy-partial-aggregation
  * discipline applied to ranking), so the shuffle moves at most
  * k·keys·partitions rows instead of the whole input, and no full sort
  * ever runs.
  *
  * Semantics match `row_number` whenever the order is total per key
  * (all gate queries); under ties both implementations return one of
  * the same valid outcomes. The original Filter is left in place above
  * the rewritten node — it passes every emitted row and guards the
  * rewrite at zero cost.
  */
case class TopKPerKeyNode(
    partitionSpec: Seq[Expression],
    orderSpec: Seq[SortOrder],
    limit: Int,
    rankAttr: Attribute,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

/** Matches Filter(rank ≤ k) directly above a single-expression
  * row_number Window and swaps in [[TopKPerKeyNode]]. Conservative on
  * purpose: exactly one window expression, a RowNumber with the
  * standard frame, a plain integer bound, and a non-empty order. */
object RewriteRankFilterToTopK extends Rule[LogicalPlan] {

  private val MaxK = 10000 // heap-per-key only pays off for small k

  private def boundFrom(cond: Expression, rank: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, IntegerLiteral(n)) if a.semanticEquals(rank) => Some(n)
    case LessThan(a: Attribute, IntegerLiteral(n)) if a.semanticEquals(rank) => Some(n - 1)
    case EqualTo(a: Attribute, IntegerLiteral(1)) if a.semanticEquals(rank) => Some(1)
    case GreaterThanOrEqual(IntegerLiteral(n), a: Attribute) if a.semanticEquals(rank) => Some(n)
    case GreaterThan(IntegerLiteral(n), a: Attribute) if a.semanticEquals(rank) => Some(n - 1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, w: Window) =>
      w.windowExpressions match {
        case Seq(alias @ Alias(WindowExpression(RowNumber(),
            WindowSpecDefinition(ps, os, SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _))
            if os.nonEmpty =>
          boundFrom(cond, alias.toAttribute) match {
            case Some(k) if k >= 1 && k <= MaxK =>
              Filter(cond, TopKPerKeyNode(ps, os, k, alias.toAttribute, w.child))
            case _ => f
          }
        case _ => f
      }
  }
}

/** Physical top-k per key. `rankAttr = None` is the partial (pre-shuffle)
  * pass: no required distribution, emits ≤ limit rows per key per input
  * partition (plus streamed-through overflow), no rank. `rankAttr =
  * Some(_)` is the final pass: requires co-location by key AND
  * (key, order) child ordering, so Spark plans a stock *external
  * spillable* SortExec over the already-partial-reduced shuffle output,
  * and the final pass is a streaming group scan with O(1) state.
  *
  * Memory story (the reason this beats WindowExec at scale):
  *   - partial pass: at most [[TopKPerKeyExec.MaxPartialKeys]] heaps of
  *     ≤ k rows; once the key map is full, rows of NEW keys are emitted
  *     lazily the moment they arrive (never accumulated) — emitting
  *     extra rows is always CORRECT because the final pass re-selects
  *     exactly k per key;
  *   - exchange+sort: operates on the reduced stream and spills via the
  *     stock UnsafeExternalSorter;
  *   - final pass: one counter + one grouping key, no per-key state. */
case class TopKPerKeyExec(
    partitionSpec: Seq[Expression],
    orderSpec: Seq[SortOrder],
    limit: Int,
    rankAttr: Option[Attribute],
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output ++ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr.toSeq)

  override def requiredChildDistribution: Seq[Distribution] =
    if (rankAttr.isEmpty) Seq(UnspecifiedDistribution)
    else if (partitionSpec.isEmpty) Seq(AllTuples)
    else Seq(ClusteredDistribution(partitionSpec))

  /** Final pass consumes (key, order)-sorted input — EnsureRequirements
    * plans a stock external (spilling) sort over the partial-reduced
    * stream, keeping this operator itself O(1)-state. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    if (rankAttr.isEmpty) Seq(Nil)
    else Seq(partitionSpec.map(SortOrder(_, Ascending)) ++ orderSpec)

  override def outputPartitioning = child.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    if (rankAttr.isEmpty) Nil
    else partitionSpec.map(SortOrder(_, Ascending)) ++ orderSpec

  protected override def doExecute(): RDD[InternalRow] = {
    val isFinal = rankAttr.isDefined
    val k = limit
    val ps = partitionSpec
    val os = orderSpec
    val childOutput = child.output
    val outAttrs = output
    if (!isFinal) {
      child.execute().mapPartitions({ it =>
        val keyProj = UnsafeProjection.create(ps, childOutput)
        val rowProj = UnsafeProjection.create(childOutput, childOutput)
        val ord = GenerateOrdering.generate(os, childOutput)
        // head of each queue = the WORST retained row (max under ord)
        val worstFirst = new java.util.Comparator[InternalRow] {
          def compare(x: InternalRow, y: InternalRow): Int = -ord.compare(x, y)
        }
        val heaps = new java.util.LinkedHashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
        val maxKeys = TopKPerKeyExec.MaxPartialKeys
        // Reduce in-flight; rows of keys past the cap stream out the
        // moment they arrive (never buffered). Iterator.++ is by-name,
        // so the heap drain below runs only after the input is exhausted.
        val reduced = it.flatMap { row =>
          val key = keyProj(row)
          var heap = heaps.get(key)
          if (heap == null) {
            if (heaps.size() >= maxKeys) {
              Iterator.single[InternalRow](rowProj(row)) // lazy pass-through
            } else {
              heap = new java.util.PriorityQueue[InternalRow](k, worstFirst)
              heaps.put(key.copy(), heap)
              heap.add(rowProj(row).copy())
              Iterator.empty
            }
          } else if (heap.size() < k) {
            heap.add(rowProj(row).copy())
            Iterator.empty
          } else if (ord.compare(row, heap.peek()) < 0) {
            heap.poll()
            heap.add(rowProj(row).copy())
            Iterator.empty
          } else Iterator.empty
        }
        import scala.jdk.CollectionConverters._
        reduced ++ heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
      }, preservesPartitioning = true)
    } else {
      child.execute().mapPartitions({ it =>
        val keyProj = UnsafeProjection.create(ps, childOutput)
        val rankRow = new GenericInternalRow(1)
        val joined = new JoinedRow
        val outProj = UnsafeProjection.create(outAttrs, outAttrs)
        var curKey: UnsafeRow = null
        var curCount = 0
        it.flatMap { row =>
          val key = keyProj(row)
          if (curKey == null || key != curKey) { curKey = key.copy(); curCount = 0 }
          curCount += 1
          if (curCount <= k) {
            rankRow.setInt(0, curCount)
            Iterator.single[InternalRow](outProj(joined(row, rankRow)))
          } else Iterator.empty
        }
      }, preservesPartitioning = true)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKPerKeyExec {
  /** Partial-pass key-map cap: ~128k keys × k rows retained per map
    * partition; rows of keys beyond the cap stream through unreduced
    * (lazily — never buffered). System-property override exists for
    * exercising the overflow path in specs. */
  def MaxPartialKeys: Int =
    Integer.getInteger("graft.topk.maxPartialKeys", 1 << 17)
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(ps, os, k, rank, child) =>
      val partial = TopKPerKeyExec(ps, os, k, None, planLater(child))
      TopKPerKeyExec(ps, os, k, Some(rank), partial) :: Nil
    case _ => Nil
  }
}
