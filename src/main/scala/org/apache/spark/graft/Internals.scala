package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Narrow bridge to `private[spark]` surfaces the bench instrumentation
  * needs — kept to the absolute minimum (one method) and used only by
  * the measurement harness, never by any operator or query plan.
  *
  * Why it exists: BENCH_DETAIL's per-query storage columns
  * ([[graft.StorageProbe]]) are fed by listener events, and the
  * listener bus is ASYNC — reading the counters without a drain would
  * attribute one query's tail events to the next query's window. The
  * drain (`LiveListenerBus.waitUntilEmpty`) is `private[spark]`, so the
  * accessor lives in an `org.apache.spark` subpackage; everything else
  * the probe consumes (`SparkListener`, `BlockUpdatedInfo`,
  * `RDDBlockId`) is public API. */
object Internals {
  /** Block until every queued listener event has been delivered (or
    * the bus's own timeout trips — surfaced as best-effort false). */
  def drainListenerBus(sc: SparkContext): Boolean =
    try { sc.listenerBus.waitUntilEmpty(); true }
    catch { case _: java.util.concurrent.TimeoutException => false }
}
