package org.apache.spark

/** Package-private accessor (the same minimal-bridge pattern as the two
  * org.apache.spark.sql bridges): Bench's per-query write-byte attribution
  * needs the listener queue drained between queries, and LiveListenerBus
  * .waitUntilEmpty is private[spark].
  */
object GraftListenerBridge {
  def drain(sc: SparkContext, timeoutMs: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
