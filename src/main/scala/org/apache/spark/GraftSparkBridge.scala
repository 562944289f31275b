package org.apache.spark

/** Bridge to `private[spark]` SparkContext internals the engine needs:
  * draining the async listener bus so per-partition metrics collected
  * by a SparkListener are complete before a checkpoint manifest is
  * written. Same adapter pattern as GraftColumnBridge.
  */
object GraftSparkBridge {
  /** Block until all queued listener events have been delivered. */
  def waitListenerEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
