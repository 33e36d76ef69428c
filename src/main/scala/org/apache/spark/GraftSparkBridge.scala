package org.apache.spark

/** Access to `private[spark]` listener-bus draining — needed so scoped
  * metrics listeners observe every task-end event before detaching
  * (listener events post asynchronously).
  */
object GraftSparkBridge {
  def drainListeners(sc: SparkContext, timeoutMs: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
