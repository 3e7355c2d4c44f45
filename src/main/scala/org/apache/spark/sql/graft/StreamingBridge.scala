package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession

/** `private[sql]` streaming internals the library legitimately needs —
  * same charter as [[ColumnBridge]].
  */
object StreamingBridge {

  /** Force-register the driver's StateStoreCoordinator RPC endpoint.
    * Batch-mode `transformWithState` asks the coordinator for store
    * locations, but only a STREAMING query start touches the manager's
    * lazy ref that registers it — in a batch-only session the lookup dies
    * with RpcEndpointNotFoundException. Idempotent (lazy val).
    */
  def ensureStateStoreCoordinator(spark: SparkSession): Unit = spark match {
    case cs: org.apache.spark.sql.classic.SparkSession =>
      cs.streams.stateStoreCoordinator: Unit
    case _ => ()
  }
}
