package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** TOP-K-PER-GROUP as a whole physical operator — the (c) tier of the
  * custom-operator ladder: a LogicalPlan node, a SparkStrategy, and a
  * SparkPlan pair, registered through SparkSessionExtensions
  * (GraftExtensions.injectPlannerStrategy).
  *
  * WHY an operator instead of the window form: ROW_NUMBER() OVER
  * (PARTITION BY g ORDER BY o) sorts every group's FULL row set before
  * the rank filter throws all but k rows away — at 100 TB that is a
  * full-shuffle + full-sort of the corpus to keep a sliver. This
  * operator keeps a bounded heap of k rows per group on each input
  * partition (O(n log k) compares, O(groups·k) memory), shuffles ONLY
  * the per-partition survivors (ClusteredDistribution on the group
  * keys — EnsureRequirements inserts the one hash exchange), and
  * re-heaps to the exact global top-k. Shuffle volume drops from
  * |corpus| to |partitions|·|groups|·k rows, and no sort of anything
  * larger than k ever happens.
  *
  * Semantics contract: `order` must be a TOTAL order (callers append a
  * unique tie-break column, same as the window form needs for a
  * deterministic rank) — then the emitted set and ranks are exactly
  * ROW_NUMBER ≤ k. The final operator appends `rank` (1-based,
  * IntegerType) in heap-drain order.
  *
  * Disclosed bound: per-task state is (groups in partition)·k rows
  * with no spill path — the same memory envelope as the
  * ObjectHashAggregate the TopKAggregator path uses. For group
  * cardinalities where that breaks, the window form (which sorts and
  * spills) is the fallback; the strategy makes no silent choice.
  */
final case class TopKPerGroupPlan(
    groupCols: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: AttributeReference,  // constructor member: exprId must survive copy()
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupPlan =
    copy(child = newChild)
}

object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupPlan(g, o, k, rank, child) =>
      val partial = TopKPerGroupExec(g, o, k, rankAttr = None, planLater(child))
      TopKPerGroupExec(g, o, k, rankAttr = Some(rank), partial) :: Nil
    case _ => Nil
  }
}

/** One phase of the bounded-heap top-k. `rankAttr = None` → partial
  * (any distribution, emits per-partition survivors, schema
  * unchanged); `Some(attr)` → final (requires the group clustering,
  * appends the 1-based rank).
  */
final case class TopKPerGroupExec(
    groupCols: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Option[AttributeReference],
    child: SparkPlan) extends UnaryExecNode {

  private def partial: Boolean = rankAttr.isEmpty

  override def output: Seq[Attribute] = child.output ++ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr.toSeq)
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupCols) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val groupExprs = groupCols
    val sortOrder = order
    val childOutput = child.output
    val outAttrs = output
    val limit = k
    val emitRank = !partial
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(groupExprs, childOutput)
      val ord = GenerateOrdering.generate(sortOrder, childOutput)
      // head of each queue = WORST kept row (reverse the sort order)
      val worstFirst = new java.util.Comparator[UnsafeRow] {
        override def compare(a: UnsafeRow, b: UnsafeRow): Int = ord.compare(b, a)
      }
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
      while (iter.hasNext) {
        val row = iter.next().asInstanceOf[UnsafeRow]
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[UnsafeRow](limit, worstFirst)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < limit) heap.add(row.copy())
        else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll(); heap.add(row.copy())
        }
      }
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val rankRow = new GenericInternalRow(1)
      val groups = heaps.values().iterator()
      new Iterator[InternalRow] {
        private var current: Array[UnsafeRow] = Array.empty
        private var i = 0
        override def hasNext: Boolean = {
          while (i >= current.length && groups.hasNext) {
            val heap = groups.next()
            current = new Array[UnsafeRow](heap.size)
            // drain worst-first, store back-to-front -> best-first
            var j = current.length - 1
            while (j >= 0) { current(j) = heap.poll(); j -= 1 }
            i = 0
          }
          i < current.length
        }
        override def next(): InternalRow = {
          val row = current(i)
          i += 1
          if (emitRank) {
            rankRow.setInt(0, i)
            outProj(joined(row, rankRow)).copy()
          } else row
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

object TopKPerGroup {
  /** DataFrame API: exact per-group top-k with appended 1-based
    * `rankName` column. `orderBy` entries are (columnName, descending)
    * pairs and must together form a total order (append a unique
    * tie-break, exactly as a deterministic ROW_NUMBER needs).
    */
  def apply(df: DataFrame, groupCols: Seq[String],
            orderBy: Seq[(String, Boolean)], k: Int,
            rankName: String = "rank"): DataFrame = {
    val analyzed = df.queryExecution.analyzed
    def resolve(name: String): Attribute =
      analyzed.output.find(_.name == name).getOrElse(
        sys.error(s"topKPerGroup: no column '$name' in ${analyzed.output.map(_.name)}"))
    val groupExprs: Seq[Expression] = groupCols.map(resolve)
    val sortOrders = orderBy.map { case (name, desc) =>
      SortOrder(resolve(name),
        if (desc) org.apache.spark.sql.catalyst.expressions.Descending
        else org.apache.spark.sql.catalyst.expressions.Ascending)
    }
    org.apache.spark.sql.graft.Internal.ofRows(df.sparkSession,
      TopKPerGroupPlan(groupExprs, sortOrders, k,
        AttributeReference(rankName, IntegerType, nullable = false)(), analyzed))
  }
}
