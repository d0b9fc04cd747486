package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Minimal bridge into `private[spark]` listener-bus internals (same
  * technique as [[org.apache.spark.sql.graftbridge.Bridge]]): metric
  * capture must drain the async listener bus before reading counters, or a
  * fast action's last task-end events are still in flight when the
  * snapshot is taken and shuffle/spill bytes under-report
  * nondeterministically.
  */
object ListenerBridge {
  /** Block until every queued listener event has been delivered. */
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
