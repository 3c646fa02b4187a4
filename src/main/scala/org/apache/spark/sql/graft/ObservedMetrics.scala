package org.apache.spark.sql.graft

import org.apache.spark.sql.Observation

/** Poll helper for [[Observation]] metrics.
  *
  * `Dataset.localCheckpoint(eager = true)` runs its materialization
  * through `withAction`, so `observe(...)` metrics attached to the
  * pre-checkpoint plan ARE collected during the checkpoint job — which
  * lets iterative algorithms read their per-round convergence witness
  * off the materialization pass itself instead of paying a second
  * aggregation job per round. Delivery is asynchronous (the listener
  * bus), so callers poll briefly; `Observation.get` alone could block
  * forever if an execution path ever bypassed the listener.
  *
  * Lives in this package for access to the `private[sql]`
  * `Observation.getOrEmpty` (the public surface only exposes the
  * indefinitely-blocking `get`).
  */
object ObservedMetrics {

  /** The observed metrics row, or None if not delivered within
    * `waitMs` (caller falls back to an explicit aggregation job).
    */
  def poll(obs: Observation, waitMs: Long = 2000): Option[Map[String, Any]] = {
    val deadline = System.nanoTime + waitMs * 1000000L
    var m: Map[String, _] = obs.getOrEmpty
    while (m.isEmpty && System.nanoTime < deadline) {
      Thread.sleep(2)
      m = obs.getOrEmpty
    }
    if (m.isEmpty) None else Some(m.asInstanceOf[Map[String, Any]])
  }
}
