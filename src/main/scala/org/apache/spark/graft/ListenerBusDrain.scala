package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Bridge into `private[spark]` listener-bus internals: job-count
  * instruments (the `IndexJobCountSpec` pins, `graft.JobProfile`) must
  * observe EVERY job a query submitted before reading their counters,
  * and `waitUntilEmpty` is the only deterministic drain — a fixed sleep
  * lets a slow bus bleed one query's late job-start events into the
  * next query's count. */
object ListenerBusDrain {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
