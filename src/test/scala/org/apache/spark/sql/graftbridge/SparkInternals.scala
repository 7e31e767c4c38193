package org.apache.spark.sql.graftbridge

import org.apache.spark.SparkContext

/** `SparkContext.listenerBus` is `private[spark]`; tests that assert
  * "building this plan launched zero jobs" need to flush it so job
  * events from a hidden driver-side collect cannot race the
  * assertion. */
object SparkInternals {
  def flushListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
