package org.apache.spark.sql.graft

import org.apache.spark.SparkContext

/** `SparkContext.listenerBus` is `private[spark]`; the dev Profile tool
  * needs its `waitUntilEmpty` to drain job/stage events deterministically
  * before reporting (a fixed sleep raced late events off a loaded host
  * and under-counted jobs). This accessor lives in the repo's
  * `org.apache.spark.sql.graft` shim package for visibility only.
  */
object ListenerDrain {
  /** Block until the listener bus has delivered every queued event, or
    * `timeoutMillis` elapsed. */
  def waitUntilEmpty(sc: SparkContext, timeoutMillis: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)
}
