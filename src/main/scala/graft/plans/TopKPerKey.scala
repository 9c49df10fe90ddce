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
  *
  * Memory safety: the heap map is capped at `spark.graft.topk.maxKeysPerTask`
  * distinct keys (default 2^20). On breach — a very-high-cardinality group
  * column, the case where Spark's own hash aggregate falls back to
  * sort-based aggregation — each stage degrades differently:
  *
  *   - PARTIAL: flush-and-reset. The current heap contents are emitted and
  *     the map cleared; heaping restarts on the remaining input. Correct
  *     because a row is only ever evicted when k better same-key rows
  *     coexist in its batch, which proves it is not in the true top-k
  *     regardless of batching — so the union of flushed batches is still a
  *     superset of every key's top-k (≤ k rows per key PER BATCH reach the
  *     exchange instead of exactly ≤ k, trading shuffle volume for a hard
  *     memory bound).
  *   - FINAL: external-sort fallback (must emit EXACTLY k per key, so
  *     flushing is not an option). All kept rows plus the remaining input
  *     go through Spark's spillable [[GraftSorterBridge]] sort on
  *     (group key, order), then one streaming scan emits the first k rows
  *     of each key group in O(1) heap beyond the sorter's managed pages.
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
    val schemaLocal = schema
    val isFinal = this.isInstanceOf[TopKFinalExec]
    val maxKeys = conf.getConfString("spark.graft.topk.maxKeysPerTask",
      (1 << 20).toString).toInt
    require(maxKeys > 0,
      s"spark.graft.topk.maxKeysPerTask must be positive, got $maxKeys " +
        "(a non-positive cap would silently drop every row in partial mode)")
    child.execute().mapPartitions({ it =>
      val keyProj = UnsafeProjection.create(groupLocal, outputLocal)
      val ordering = GenerateOrdering.generate(orderLocal, outputLocal)
      val rowOrd: Ordering[InternalRow] = (a, b) => ordering.compare(a, b)
      // max-heap of the k best rows per key: head = current worst of the
      // kept set, evicted when a better row arrives.
      val heaps = new java.util.HashMap[UnsafeRow,
        scala.collection.mutable.PriorityQueue[InternalRow]]()

      /** false iff the row's key is NEW and the map is at capacity. */
      def insert(row: InternalRow): Boolean = {
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          if (heaps.size() >= maxKeys) return false
          heap = scala.collection.mutable.PriorityQueue.empty(rowOrd)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kLocal) heap.enqueue(row.copy())
        else if (ordering.compare(row, heap.head) < 0) {
          heap.dequeue(); heap.enqueue(row.copy())
        }
        true
      }

      /** Emit-and-clear the heap map (rows stay referenced by the queues). */
      def drain(): Iterator[InternalRow] = {
        import scala.jdk.CollectionConverters._
        val vals = new java.util.ArrayList[
          scala.collection.mutable.PriorityQueue[InternalRow]](heaps.values())
        heaps.clear()
        vals.iterator().asScala.flatMap(_.iterator)
      }

      /** Consume input until a capacity breach or exhaustion; returns the
        * breaching row (copied), or null when the input is exhausted.
        */
      def fill(): InternalRow = {
        while (it.hasNext) {
          val row = it.next()
          if (!insert(row)) return row.copy()
        }
        null
      }

      if (!isFinal) {
        // PARTIAL: rounds of fill → flush; lazy so a flushed batch streams
        // to the exchange before the next round's heaps build up.
        new Iterator[InternalRow] {
          private var cur: Iterator[InternalRow] = Iterator.empty
          private var pendingBreach: InternalRow = _
          private def advance(): Boolean = {
            while (!cur.hasNext &&
                (pendingBreach != null || it.hasNext || !heaps.isEmpty)) {
              if (pendingBreach != null) {
                insert(pendingBreach) // map was just cleared; cannot breach
                pendingBreach = null
              }
              pendingBreach = fill()
              cur = drain()
            }
            cur.hasNext
          }
          override def hasNext: Boolean = advance()
          override def next(): InternalRow = {
            if (!advance()) throw new NoSuchElementException
            cur.next()
          }
        }
      } else {
        val breach = fill()
        if (breach == null) drain()
        else {
          // FINAL fallback: spillable sort on (key, order), streaming
          // first-k-per-key scan.
          val combined =
            groupLocal.map(SortOrder(_, Ascending)) ++ orderLocal
          val sortOrd = GenerateOrdering.generate(combined, outputLocal)
          val toUnsafe = UnsafeProjection.create(outputLocal, outputLocal)
          def asUnsafe(r: InternalRow): UnsafeRow = r match {
            case u: UnsafeRow => u
            case other => toUnsafe(other) // sorter copies on insert
          }
          val all = (drain() ++ Iterator.single(breach) ++ it).map(asUnsafe)
          val sorted = org.apache.spark.sql.execution.GraftSorterBridge
            .sort(schemaLocal, sortOrd, all)
          var curKey: UnsafeRow = null
          var n = 0
          sorted.filter { row =>
            val key = keyProj(row)
            if (curKey == null || key != curKey) { curKey = key.copy(); n = 1 }
            else n += 1
            n <= kLocal
          }
        }
      }
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
    // Group keys are compared by UnsafeRow BYTES (heap map) and by codegen'd
    // ordering (sort fallback); float/double keys must normalize -0.0→0.0
    // and NaN payloads first or the two paths could split groups differently
    // — the same normalization Spark's own aggregates apply before grouping.
    val g = keys.map(attr).map { a =>
      a.dataType match {
        case org.apache.spark.sql.types.FloatType |
            org.apache.spark.sql.types.DoubleType =>
          org.apache.spark.sql.catalyst.optimizer.NormalizeNaNAndZero(a)
        case _ => a
      }
    }
    val s = orderBy.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    org.apache.spark.sql.GraftPlanBridge.ofRows(spark,
      TopKPerKeyPlan(g, s, k, analyzed))
  }
}
