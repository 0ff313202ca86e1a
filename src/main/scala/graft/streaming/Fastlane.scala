package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.core.{FeatureDef, FeatureStore, Versioning}

/** Fastlane (serving) mode: the reference's single-row low-latency path
  * (reference: README.md:47-55 — "processing a single row — fastlane
  * (serving)", persistent cluster vs per-feature batch cluster).
  *
  * The SAME `FeatureDef.transform` that runs in batch runs here over a
  * Structured Streaming micro-batch — pipeline code is mode-agnostic by
  * construction (the reference's design goal). Each micro-batch is
  * MERGE-upserted into the feature store keyed on the entity, so the stored
  * table always holds the latest feature value per entity — the
  * exactly-once-ish contract is idempotent upsert by
  * (entityKey, __data_hash).
  */
object Fastlane {

  /** Attach a streaming source to a feature pipeline and upsert each
    * micro-batch into the store. Caller owns query lifecycle (await/stop). */
  def serve(
      feature: FeatureDef,
      stream: DataFrame,
      store: FeatureStore,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow())
      (implicit spark: SparkSession): StreamingQuery = {
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val out = Versioning.withSystemColumns(feature.transform(batch), feature)
          store.merge(feature.name, out, feature.entityKeys,
            Map("feature" -> feature.name, "mode" -> "fastlane", "batch_id" -> batchId.toString))
          ()
        }
      }
      .start()
  }

  /** Warm-session single-row path: run one mini-frame through the identical
    * pipeline synchronously (lowest-latency serving without a stream). */
  def serveOnce(feature: FeatureDef, rows: DataFrame, store: FeatureStore)
               (implicit spark: SparkSession): Long = {
    val out = Versioning.withSystemColumns(feature.transform(rows), feature)
    store.merge(feature.name, out, feature.entityKeys,
      Map("feature" -> feature.name, "mode" -> "fastlane_once"))
  }

  /** High-frequency serving: O(batch) delta append per micro-batch instead of
    * the O(table) copy-on-write MERGE — the write cost no longer grows with
    * table size. Read the serving state with
    * `store.readCurrent(feature, keys)`; run `store.compact` periodically
    * (e.g. from the batch lane) to fold deltas. */
  def serveAppend(
      feature: FeatureDef,
      stream: DataFrame,
      store: FeatureStore,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow())
      (implicit spark: SparkSession): StreamingQuery = {
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val out = Versioning.withSystemColumns(feature.transform(batch), feature)
          store.appendDelta(feature.name, out)
          ()
        }
      }
      .start()
  }
}
