package graft.sources

import org.apache.spark.SparkContext

/** Deterministic lifecycle for per-batch `localCheckpoint` blocks.
  *
  * Every ingest batch through [[graft.pipelines.IngestPipeline]] (and
  * the incremental indexes it composes) materializes a handful of
  * intermediate frames via `localCheckpoint` — the right call inside
  * one batch (cut lineage, evaluate once, feed several consumers), but
  * the blocks it pins in the BlockManager have no explicit release:
  * Spark frees them only when the DRIVER's garbage collector happens to
  * collect the unreachable RDD object and the asynchronous
  * ContextCleaner then broadcasts the removal. On a long-running
  * single-JVM ingest series that coupling is a real leak-until-GC: tens
  * of checkpointed frames per batch accumulate in executor storage
  * memory (in cluster mode the blocks live on EXECUTORS while the
  * decision to free them waits on DRIVER heap pressure — the classic
  * footgun), degrading batch times non-monotonically as cleanup arrives
  * in GC-driven bursts. Measured: the r13 gates-on pipeline stress
  * drifted ~+1 s/batch with a non-monotone tail; with scoped release
  * the same series is flat (BENCH_PIPELINE_GATES_r14.json).
  *
  * A scope snapshots the set of persisted-RDD ids at open and, at
  * `close()`, unpersists every RDD persisted SINCE — which is exactly
  * the batch's checkpoints when the scope wraps one batch. Intercepting
  * at the SparkContext registry (public API) instead of at each
  * `localCheckpoint` call site means the scope also covers checkpoints
  * made deep inside composed operators (connected-components
  * generations, candidate-verify stages) without threading a handle
  * through every signature.
  *
  * Contract: single writer, one scope at a time per SparkContext —
  * anything persisted while the scope is open is released at close, so
  * do not create caches you intend to KEEP inside an open scope, and do
  * not interleave two scoped batches on one context (the serial-batch
  * discipline every incremental index here already requires).
  * `close()` is idempotent; unpersist is non-blocking (block removal
  * proceeds in the background while the next batch starts).
  */
final class CheckpointScope(sc: SparkContext) {
  private val before: Set[Int] = sc.getPersistentRDDs.keySet.toSet
  private var closed = false

  def close(): Unit = synchronized {
    if (!closed) {
      closed = true
      sc.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!before.contains(id)) rdd.unpersist(blocking = false)
      }
    }
  }
}

object CheckpointScope {
  /** Run `f` with a fresh scope; release everything it persisted. */
  def withScope[T](sc: SparkContext)(f: => T): T = {
    val s = new CheckpointScope(sc)
    try f finally s.close()
  }
}
