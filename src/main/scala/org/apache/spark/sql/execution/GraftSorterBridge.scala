package org.apache.spark.sql.execution

import org.apache.spark.SparkEnv
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.UnsafeRow
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.collection.unsafe.sort.PrefixComparators

/** Package-private bridge (same pattern as [[org.apache.spark.sql.GraftPlanBridge]]):
  * expose Spark's spillable row sorter to graft's physical operators.
  *
  * [[UnsafeExternalRowSorter]] is what `SortExec` itself runs on — it sorts
  * UnsafeRows in task memory and spills to disk under memory pressure, which
  * is exactly the fallback a bounded-memory operator needs. A constant sort
  * prefix is used (every comparison goes through the full row ordering);
  * radix sort is disabled accordingly. The sorter registers its own
  * task-completion cleanup listener.
  */
object GraftSorterBridge {

  /** Externally (spillably) sort `input` under `ordering`. Consumes the
    * iterator; the returned iterator streams rows in sorted order.
    */
  def sort(
      schema: StructType,
      ordering: Ordering[InternalRow],
      input: Iterator[UnsafeRow]): Iterator[InternalRow] = {
    val prefixComputer = new UnsafeExternalRowSorter.PrefixComputer {
      private val result = new UnsafeExternalRowSorter.PrefixComputer.Prefix
      override def computePrefix(
          row: InternalRow): UnsafeExternalRowSorter.PrefixComputer.Prefix = {
        result.value = 0L
        result.isNull = false
        result
      }
    }
    val sorter = UnsafeExternalRowSorter.create(
      schema, ordering, PrefixComparators.LONG, prefixComputer,
      SparkEnv.get.memoryManager.pageSizeBytes, /* canUseRadixSort = */ false)
    sorter.sort(input)
  }
}
