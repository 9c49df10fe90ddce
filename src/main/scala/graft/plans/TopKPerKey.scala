package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Grouped top-k as a first-class operator: for each distinct key, the k
  * first rows under `order` — SURVEY.md §2.7's top-k generalized per-key.
  *
  * Spark's only built-in form is `row_number().over(Window...) <= k`: a full
  * shuffle of EVERY row followed by a per-partition sort. At 100 TB that
  * shuffles the whole fact table to answer a question whose result is
  * |keys|·k rows. This operator instead runs bounded-heap partial top-k
  * before the exchange (the aggregation-style partial/final split):
  *
  *   TopKFinalExec (requires clustering on keys; merges heaps)
  *     └─ Exchange hashpartitioning(keys)   ← ships ≤ |keys|·k rows/partition
  *         └─ TopKPartialExec (per input partition, no distribution req)
  *             └─ child
  *
  * Memory per task is O(|keys in partition| · k) copied rows. Row comparison
  * uses a codegen'd ordering (GenerateOrdering) over the declared SortOrder.
  *
  * Wired as the full custom-operator stack: logical node → SparkStrategy →
  * physical nodes, injected via [[graft.functions.GraftExtensions]]
  * (injectPlannerStrategy) or per-session through
  * `spark.experimental.extraStrategies` ([[TopKPerKey.apply]] does this).
  */
case class TopKPerKeyPlan(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

/** Optimizer rule: a Filter over [[TopKPerKeyPlan]] that references only the
  * GROUP columns commutes with per-key top-k (dropping whole keys cannot
  * change any surviving key's top rows), so it pushes below the operator —
  * from there Catalyst's own pushdown carries it into the scan. At scale
  * this turns "heap every key, then drop most keys" into "scan-prune first".
  * Filters touching non-group columns stay put (they would change the
  * per-key candidate set).
  */
object TopKFilterPushdown
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.AttributeSet
  import org.apache.spark.sql.catalyst.plans.logical.Filter

  override def apply(plan: LogicalPlan): LogicalPlan = plan transformUp {
    case f @ Filter(cond, t: TopKPerKeyPlan)
        if cond.references.subsetOf(
          AttributeSet(t.groupExprs.flatMap(_.references))) =>
      t.copy(child = Filter(cond, t.child))
  }
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(g, s, k, child) =>
      TopKFinalExec(g, s, k, TopKPartialExec(g, s, k, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** Shared bounded-heap evaluation: per key, keep the k smallest rows under
  * `order` (SortOrder ascending = "first"). Emits heap contents unordered —
  * callers sort if they need ranked output.
  */
trait TopKExec extends UnaryExecNode {
  def groupExprs: Seq[Expression]
  def order: Seq[SortOrder]
  def k: Int

  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    this match {
      case e: TopKPartialExec => e.copy(child = newChild)
      case e: TopKFinalExec   => e.copy(child = newChild)
    }

  protected override def doExecute(): RDD[InternalRow] = {
    val groupLocal = groupExprs
    val orderLocal = order
    val outputLocal = output
    val kLocal = k
    child.execute().mapPartitions({ it =>
      val keyProj = UnsafeProjection.create(groupLocal, outputLocal)
      val ordering = GenerateOrdering.generate(orderLocal, outputLocal)
      // max-heap of the k best rows per key: head = current worst of the
      // kept set, evicted when a better row arrives.
      val heaps = new java.util.HashMap[UnsafeRow,
        scala.collection.mutable.PriorityQueue[InternalRow]]()
      val rowOrd: Ordering[InternalRow] = (a, b) => ordering.compare(a, b)
      while (it.hasNext) {
        val row = it.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = scala.collection.mutable.PriorityQueue.empty(rowOrd)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kLocal) heap.enqueue(row.copy())
        else if (ordering.compare(row, heap.head) < 0) {
          heap.dequeue(); heap.enqueue(row.copy())
        }
      }
      val outIt = new java.util.ArrayList[InternalRow]()
      heaps.values().forEach(h => h.foreach(outIt.add))
      import scala.jdk.CollectionConverters._
      outIt.iterator().asScala
    }, preservesPartitioning = true)
  }
}

case class TopKPartialExec(
    groupExprs: Seq[Expression], order: Seq[SortOrder], k: Int,
    child: SparkPlan) extends TopKExec {
  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: Nil
}

case class TopKFinalExec(
    groupExprs: Seq[Expression], order: Seq[SortOrder], k: Int,
    child: SparkPlan) extends TopKExec {
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupExprs) :: Nil
}

object TopKPerKey {

  /** Per-key top-k of `df`: keys by name, order as (column, ascending) —
    * include a unique tie-break column for deterministic results.
    */
  def apply(df: DataFrame, keys: Seq[String],
      orderBy: Seq[(String, Boolean)], k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    if (!spark.experimental.extraOptimizations.contains(TopKFilterPushdown))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ TopKFilterPushdown
    val analyzed = df.queryExecution.analyzed
    val byName = analyzed.output.map(a => a.name -> a).toMap
    def attr(n: String) = byName.getOrElse(n,
      throw new IllegalArgumentException(
        s"column '$n' not in ${byName.keys.mkString(", ")}"))
    val g = keys.map(attr)
    val s = orderBy.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    org.apache.spark.sql.GraftPlanBridge.ofRows(spark,
      TopKPerKeyPlan(g, s, k, analyzed))
  }
}
