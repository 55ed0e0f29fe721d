package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** `listenerBus` is private[spark]; the CostReport diagnostic needs to
  * drain it so task-metric accumulation is complete before reading —
  * same narrow-bridge policy as sql.graftbridge.
  */
object ListenerBridge {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
