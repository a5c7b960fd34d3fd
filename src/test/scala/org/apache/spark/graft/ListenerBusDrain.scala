package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Test-only bridge into `private[spark]` listener-bus internals: the
  * job-count pins must observe EVERY job a window submitted before
  * asserting, and `waitUntilEmpty` is the only deterministic drain. */
object ListenerBusDrain {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
