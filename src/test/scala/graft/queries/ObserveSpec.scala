package graft.queries

import java.util.concurrent.{CountDownLatch, TimeUnit}

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

import graft.SparkSpec
import graft.sources.Tables

/** `Dataset.observe` — in-flight data-quality metrics (row counts, null
  * counts, sums) accumulated DURING a job, no second pass over the data.
  * This is how a 100 TB pipeline gates a write on quality thresholds
  * without re-scanning what it just wrote: the metrics ride the action's
  * own tasks and arrive via QueryExecutionListener when it finishes.
  */
class ObserveSpec extends SparkSpec {

  test("observe() delivers quality metrics with the action, no extra scan") {
    val sf = "/root/testdata/sf0.001"
    @volatile var metrics: Option[org.apache.spark.sql.Row] = None
    val latch = new CountDownLatch(1)
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit = {
        qe.observedMetrics.get("quality_gate").foreach { row =>
          metrics = Some(row)
          latch.countDown()
        }
      }
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val out = Tables.lineitem(spark, sf)
        .observe("quality_gate",
          count(lit(1)).as("n_rows"),
          sum(when(col("l_quantity").isNull, 1).otherwise(0)).as("n_null_qty"),
          max("l_quantity").as("max_qty"))
        .filter(col("l_quantity") > 0)
      val nOut = out.count()
      assert(latch.await(30, TimeUnit.SECONDS), "observed metrics never arrived")
      val m = metrics.get
      // Metrics are measured at the observe point (pre-filter): full scan
      // row count, zero nulls in testdata, and a sane domain max.
      assert(m.getAs[Long]("n_rows") === 6000L)
      assert(m.getAs[Long]("n_null_qty") === 0L)
      assert(m.getAs[Double]("max_qty") > 0.0)
      assert(nOut <= m.getAs[Long]("n_rows"))
    } finally spark.listenerManager.unregister(listener)
  }
}
