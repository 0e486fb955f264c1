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
  * partition, no rank. `rankAttr = Some(_)` is the final pass: requires
  * co-location by key, emits each key's rows in order with their rank.
  *
  * Per-partition state is one k-heap per distinct key seen (≤ k·keys
  * rows). The partial pass caps its key map at [[TopKPerKeyExec.MaxPartialKeys]]
  * and passes overflow rows straight through — emitting extra rows is
  * always CORRECT (the final pass re-selects exactly k), so the cap
  * bounds memory without a spill path. */
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

  override def outputPartitioning = child.outputPartitioning

  protected override def doExecute(): RDD[InternalRow] = {
    val isFinal = rankAttr.isDefined
    val k = limit
    val ps = partitionSpec
    val os = orderSpec
    val childOutput = child.output
    val outAttrs = output
    child.execute().mapPartitions({ it =>
      val keyProj = UnsafeProjection.create(ps, childOutput)
      val rowProj = UnsafeProjection.create(childOutput, childOutput)
      val ord = GenerateOrdering.generate(os, childOutput)
      // head of each queue = the WORST retained row (max under ord)
      val worstFirst = new java.util.Comparator[InternalRow] {
        def compare(x: InternalRow, y: InternalRow): Int = -ord.compare(x, y)
      }
      val heaps = new java.util.LinkedHashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      val overflow = new scala.collection.mutable.ArrayBuffer[InternalRow]()
      while (it.hasNext) {
        val row = it.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          if (!isFinal && heaps.size() >= TopKPerKeyExec.MaxPartialKeys) {
            overflow += rowProj(row).copy()   // pass through; final re-selects
          } else {
            heap = new java.util.PriorityQueue[InternalRow](k, worstFirst)
            heaps.put(key.copy(), heap)
            heap.add(rowProj(row).copy())
          }
        } else if (heap.size() < k) {
          heap.add(rowProj(row).copy())
        } else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(rowProj(row).copy())
        }
      }
      import scala.jdk.CollectionConverters._
      if (!isFinal) {
        heaps.values().iterator().asScala.flatMap(_.iterator().asScala) ++ overflow.iterator
      } else {
        val rankRow = new GenericInternalRow(1)
        val joined = new JoinedRow
        val outProj = UnsafeProjection.create(outAttrs, outAttrs)
        heaps.values().iterator().asScala.flatMap { heap =>
          val rows = heap.toArray(new Array[InternalRow](heap.size()))
          java.util.Arrays.sort(rows, ord)
          rows.iterator.zipWithIndex.map { case (r, i) =>
            rankRow.setInt(0, i + 1)
            outProj(joined(r, rankRow)).copy()
          }
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKPerKeyExec {
  /** Partial-pass key-map cap: ~128k keys × k rows retained per map
    * partition before new keys flow through unreduced. */
  val MaxPartialKeys = 1 << 17
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(ps, os, k, rank, child) =>
      val partial = TopKPerKeyExec(ps, os, k, None, planLater(child))
      TopKPerKeyExec(ps, os, k, Some(rank), partial) :: Nil
    case _ => Nil
  }
}
