package org.apache.spark

/** Bridge to `private[spark]` listener-bus drainage: metric listeners are
  * async, so a per-query metrics snapshot (graft.Bench) must wait for the
  * bus to empty before reading its counters — same package-shim pattern
  * as org.apache.spark.sql.GraftShims. */
object GraftSparkShims {
  def drainListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
