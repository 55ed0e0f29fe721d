package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.execution.streaming.state.{StateStore, StateStoreProvider, StateStoreProviderId}

/** Post-replay hygiene for the JVM-global state-store registry
  * (`StateStore.unloadAll()` is `private[sql]`, hence this bridge —
  * same extension-library pattern as ColumnBridge).
  *
  * Stopping a streaming query does NOT unload its state-store
  * providers: they stay in the global `StateStore.loadedProviders`
  * map, each retaining its in-memory version maps, and the shared
  * maintenance thread keeps scheduling snapshot/cleanup work against
  * them — work that can only fail once the replay's ephemeral
  * checkpoint dir is deleted. One replay leaks
  * (shuffle partitions × stateful operators) providers; a bench run
  * with 9+ replay queries accumulates dozens, and the cost (retained
  * heap + maintenance churn on dead dirs) lands on whatever queries
  * run LATE in the session — the observed driver-bench pattern where
  * the last few queries inflate 2.5–4× (BENCH_r06 vs a clean-env run
  * of identical code; see SCALE.md "Replay harness hygiene").
  *
  * `unloadAll()` closes and drops every loaded provider. Called after
  * each replay query's checkpoint dir is deleted — at that point the
  * providers are unrecoverable anyway. An active query unloaded by
  * mistake would simply reload from its checkpoint on the next batch,
  * so the call is safe by construction; the replay harness runs its
  * queries sequentially regardless.
  */
object StateStoreBridge {
  def unloadAll(): Unit = StateStore.unloadAll()

  /** Targeted teardown for CONCURRENT sessions: unload only the
    * providers belonging to one query run (by `StreamingQuery.runId`),
    * leaving other live queries' loaded providers — and so their warm
    * RocksDB/HDFS state — untouched.
    *
    * Why this exists: `unloadAll()` is correct for the sequential
    * bench (each replay owns the JVM), but under a mixed concurrent
    * workload (ProbeConcurrency, SCALE.md round 14) a short query's
    * teardown would evict every OTHER live query's providers too;
    * each victim then reloads its stores from the checkpoint on its
    * next micro-batch — correct (that reload path is exactly crash
    * recovery) but repeated-eviction slow. On a real cluster the
    * eviction is per-executor and just as global: `unloadAll` there
    * would be a cluster-wide state flush.
    *
    * `loadedProviders` is object-private in bytecode (not just
    * `private[sql]`), so enumeration goes through one reflective
    * field read; the removal itself uses the public-in-package
    * `removeFromLoadedProvidersAndClose`, which closes the provider
    * and cancels its maintenance work under StateStore's own lock.
    * Returns the number of providers unloaded.
    */
  def unloadQuery(runId: java.util.UUID): Int = {
    val map = loadedProviders()
    val ids = map.synchronized { map.keys.filter(_.queryRunId == runId).toList }
    ids.foreach(id => StateStore.removeFromLoadedProvidersAndClose(id))
    ids.size
  }

  /** Loaded-provider count for one query run (test observability). */
  def loadedCountForQuery(runId: java.util.UUID): Int = {
    val map = loadedProviders()
    map.synchronized { map.keys.count(_.queryRunId == runId) }
  }

  private def loadedProviders() = {
    val field = StateStore.getClass.getDeclaredField("loadedProviders")
    field.setAccessible(true)
    field.get(StateStore)
      .asInstanceOf[scala.collection.mutable.HashMap[StateStoreProviderId, StateStoreProvider]]
  }
}
