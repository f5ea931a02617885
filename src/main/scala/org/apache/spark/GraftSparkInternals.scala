package org.apache.spark

/**
 * Minimal bridge to `private[spark]` internals the bench needs for
 * SELF-ADJUDICATING measurements: per-leg executor CPU time is
 * accumulated from task-end listener events, and those are posted
 * asynchronously — snapshotting the counter without draining the bus
 * first would misattribute a slow task's CPU to the NEXT leg. Nothing
 * else crosses this seam.
 */
object GraftSparkInternals {
  /** Block until every queued listener event has been delivered. */
  def drainListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
