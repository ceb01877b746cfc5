package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Whole-operator extension: per-group top-k as a native physical
  * operator (logical node → injected strategy → two-phase SparkPlan).
  *
  * The DataFrame spelling — `row_number().over(Window.partitionBy(g)
  * .orderBy(o)) <= k` — pays a full sort of every partition after the
  * shuffle, and ships every row to that sort (WindowGroupLimit trims
  * some, but post-exchange rows are still sorted). This operator keeps a
  * bounded heap of k rows per group instead: partial heaps before the
  * exchange (only k·groups rows cross the wire — the same partial-
  * before-shuffle discipline as aggregation), a hash distribution, and a
  * final heap merge. O(n log k) per partition, no sort exec anywhere.
  *
  * Same extension ladder as `CosineSimilarity` (custom Expression), one
  * rung up: LogicalPlan + SparkStrategy + SparkPlan, installable via
  * `spark.experimental.extraStrategies` (done lazily by `topK`) or
  * `GraftExtensions` (`injectPlannerStrategy`).
  *
  * Ties at the k boundary follow the heap's eviction order — pass a
  * TOTAL order (same contract as Dedup.keepFirst) for deterministic
  * results. Groups-per-partition state is heap-resident (k rows each);
  * for group cardinalities rivaling row counts, prefer the ranking
  * window (which spills) — this operator targets many-rows-per-group.
  */
object TopKPerGroup {

  /** Top `k` rows per `groupCols` group under `orderCols` (ascending
    * semantics — pass `.desc` columns for largest-first). Output row
    * order within groups is unspecified; sort at the edge if needed. */
  def topK(df: DataFrame, groupCols: Seq[Column], orderCols: Seq[Column], k: Int): DataFrame = {
    require(k > 0 && groupCols.nonEmpty, "k > 0 and at least one grouping column")
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.exists(_.isInstanceOf[TopKStrategy]))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ new TopKStrategy
    val grouping = groupCols.map(ColumnBridge.resolvedExpression(_, spark))
    val order = orderCols.map(ColumnBridge.resolvedExpression(_, spark)).map {
      case s: SortOrder => s
      case e => SortOrder(e, Ascending)
    }
    ColumnBridge.ofRows(spark,
      TopKPerGroupPlan(grouping, order, k, ColumnBridge.logicalPlan(df)))
  }
}

/** Logical marker node: semantics only, no execution knowledge. */
case class TopKPerGroupPlan(grouping: Seq[Expression], order: Seq[SortOrder],
                            k: Int, child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupPlan =
    copy(child = newChild)
}

/** Plans the logical node as partial → (exchange via EnsureRequirements)
  * → final. */
class TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupPlan(g, o, k, child) =>
      TopKPerGroupExec(g, o, k, finalPhase = true,
        TopKPerGroupExec(g, o, k, finalPhase = false, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** Bounded-heap per-group top-k. Partial phase runs on whatever
  * partitioning arrives (map-side trim to k·groups rows); the final
  * phase demands a hash distribution on the grouping keys, which
  * EnsureRequirements satisfies with one exchange over the trimmed
  * rows. */
case class TopKPerGroupExec(grouping: Seq[Expression], order: Seq[SortOrder],
                            k: Int, finalPhase: Boolean,
                            child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (finalPhase) ClusteredDistribution(grouping) :: Nil
    else UnspecifiedDistribution :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val groupingExprs = grouping
    val orderExprs = order
    val childOutput = child.output
    val limit = k
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(groupingExprs, childOutput)
      val rowConv = UnsafeProjection.create(childOutput.map(a => a: Expression), childOutput)
      val ord = RowOrdering.create(orderExprs, childOutput)
      // PriorityQueue dequeues the MAX under `ord` — i.e. the worst of
      // the current k — which is exactly the eviction candidate.
      val heapOrd: Ordering[UnsafeRow] = ord.on((r: UnsafeRow) => r: InternalRow)
      val heaps = mutable.LinkedHashMap[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]()
      iter.foreach { row =>
        val heap = heaps.getOrElseUpdate(keyProj(row).copy(),
          mutable.PriorityQueue.empty[UnsafeRow](heapOrd))
        if (heap.size < limit) heap.enqueue(rowConv(row).copy())
        else if (ord.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(rowConv(row).copy())
        }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}
