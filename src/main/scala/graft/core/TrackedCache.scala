package graft.core

import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/** Registry of the internal frames the multi-consumer ops (Dedup,
  * Similarity, TextOps) persist and cannot unpersist themselves — their
  * return values still reference the cached plan when control returns to
  * the caller. A long-lived driver (the Fastlane ingest loop) releases
  * exactly these via [[release]] once a batch's actions are done, instead
  * of `spark.catalog.clearCache()` (which would evict every cache in the
  * session, including unrelated work sharing it).
  *
  * Release drains everything persisted through here since the last drain;
  * concurrent pipelines in one JVM that both route through this registry
  * should serialize their release points (the normal Structured Streaming
  * deployment — one ingest query owning its session — trivially does).
  * Unpersisting an already-unpersisted frame is a Spark no-op, so ops that
  * sometimes clean up after themselves can still track here safely. */
object TrackedCache {
  // WEAK references: callers that never release() (the batch API — Bench,
  // Verify, ad-hoc drivers) must not have the registry pin thousands of
  // dead Datasets (and their analyzed plans) for the JVM lifetime; once a
  // frame is unreachable its cached blocks are already reclaimable via
  // Spark's ContextCleaner, and the GC'd entry drains on the next release.
  private val live =
    new java.util.concurrent.ConcurrentLinkedQueue[java.lang.ref.WeakReference[Dataset[_]]]()

  /** Persist `ds` MEMORY_AND_DISK and remember it for the next [[release]]. */
  def persist[T](ds: Dataset[T]): Dataset[T] = {
    ds.persist(StorageLevel.MEMORY_AND_DISK)
    live.add(new java.lang.ref.WeakReference[Dataset[_]](ds))
    ds
  }

  /** Unpersist (non-blocking) every frame tracked since the last drain. */
  def release(): Unit = {
    var r = live.poll()
    while (r != null) {
      val d = r.get()
      if (d != null) d.unpersist(false)
      r = live.poll()
    }
  }

  /** `df.persistTracked()` — drop-in for `.persist(MEMORY_AND_DISK)` at the
    * ops' internal multi-consumer persist sites. */
  implicit final class TrackedDataset[T](private val ds: Dataset[T]) extends AnyVal {
    def persistTracked(): Dataset[T] = TrackedCache.persist(ds)
  }
}
