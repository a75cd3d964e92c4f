package org.apache.spark

/** Test-only bridge into `private[spark]` surface: lets specs drain the
  * async listener bus so `statusTracker` queries (e.g. job counts per
  * job group) observe every job the test just ran. */
object GraftTestBridge {
  def drainListeners(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
