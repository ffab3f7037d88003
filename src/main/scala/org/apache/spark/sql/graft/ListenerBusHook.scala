package org.apache.spark.sql.graft

import org.apache.spark.SparkContext

/** `SparkContext.listenerBus` is `private[spark]`; progress reporting
  * needs a bounded drain before detaching its listener so the final
  * task-end events aren't dropped. This is the one sanctioned crossing
  * point (same pattern as the Catalyst extensions in this package).
  */
object ListenerBusHook {
  /** Blocks until the listener bus is empty or `timeoutMs` elapses. */
  def drain(sc: SparkContext, timeoutMs: Long): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: Exception => () } // a slow bus must not fail the job
}
