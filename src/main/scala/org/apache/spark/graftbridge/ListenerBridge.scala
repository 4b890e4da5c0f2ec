package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** `private[spark]` access shim (same pattern as sql.graftbridge
  * .ColumnBridge): lets instrumentation wait for the async listener
  * bus to drain so task metrics read after an action are complete,
  * instead of sleeping and hoping.
  */
object ListenerBridge {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
