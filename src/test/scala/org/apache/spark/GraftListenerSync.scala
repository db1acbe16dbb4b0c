package org.apache.spark

/** Test bridge to the `private[spark]` listener bus so specs can drain all
  * pending listener events before asserting on job counters (the zero-jobs
  * planning gate in HubDataSourceSpec).
  */
object GraftListenerSync {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
