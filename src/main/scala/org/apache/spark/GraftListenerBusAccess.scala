package org.apache.spark

/** Accessor for the `private[spark]` listener bus — the supported way to
  * quiesce listener delivery deterministically (the bus's own
  * `waitUntilEmpty`, which Spark's test harness uses for exactly this
  * purpose) instead of a fixed sleep that can misattribute a late
  * stage-completion event to the wrong timed region. Lives in the
  * `org.apache.spark` package solely to satisfy the access qualifier;
  * no Spark internals are modified.
  */
object GraftListenerBusAccess {
  /** Block until all queued listener events are delivered, or `timeoutMs`
    * elapses. Returns false on timeout (caller decides how loud to be).
    */
  def waitUntilEmpty(sc: SparkContext, timeoutMs: Long): Boolean =
    try { sc.listenerBus.waitUntilEmpty(timeoutMs); true }
    catch { case _: java.util.concurrent.TimeoutException => false }
}
