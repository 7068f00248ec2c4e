package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.execution.streaming.state.StateStore

/** Access shim for the `private[sql]` state-store registry — same
  * technique as [[ColumnBridge]].
  *
  * A terminated AvailableNow streaming query leaves its state store
  * providers LOADED in the executor-side singleton (by design: a
  * restarted query reuses them). In a long-lived session that runs
  * many queries after a one-shot streaming pass — Verify, Bench, a
  * notebook — the loaded providers and their background maintenance
  * measurably tax unrelated queries. `unloadAll()` releases every
  * provider; the next streaming (re)start reloads from the
  * checkpoint as usual, so this is safe between queries. */
object StateStoreBridge {
  def unloadAll(): Unit = StateStore.unloadAll()
}
