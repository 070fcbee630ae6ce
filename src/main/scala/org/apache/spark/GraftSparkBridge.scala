package org.apache.spark

/** Package-private Spark core access for graft's measurement plumbing
  * (the core twin of `o.a.s.sql.GraftSqlBridge`).
  */
object GraftSparkBridge {

  /** Block until the listener bus has delivered every queued event —
    * task-end metrics are posted asynchronously, so a per-query
    * executorCpuTime read without this drain can attribute a query's
    * trailing tasks to the NEXT query.
    */
  def drainListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
