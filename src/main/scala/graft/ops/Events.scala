package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream batch operators: gap-based sessionization and time-grid
  * gap-filling (resampling). Complements the Structured Streaming
  * `session_window` path (q33) with the batch formulation a backfill over
  * historical logs needs.
  *
  * Reference scope: feray's event/feature pipelines declare sessionized and
  * regularly-resampled features over raw event logs (README.md:21-23); the
  * reference delegates the computation to its query engines, so the shapes
  * here are Spark-first designs, not translations.
  */
object Events {

  /** Gap-based sessionization: a new session starts when the time since the
    * user's previous event exceeds `gapSec` (strictly). One output row per
    * session: ordinal within the user, start/end, duration, event count,
    * distinct event types.
    *
    * Scale shape: ONE shuffle on the user key. The lag and the running
    * session counter ride the same `(user, ts, tie)` sort within that
    * exchange, and the per-session aggregation re-uses the user clustering
    * (partial agg on already-sorted data). Never a self-join, never a
    * driver-side pass. `tieCol` (a unique id) makes the order total, so the
    * session assignment is deterministic under ties.
    */
  def sessionize(df: DataFrame, userCol: String, tsCol: String, tieCol: String,
      typeCol: String, gapSec: Long): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(tieCol))
    val us = unix_micros(col(tsCol))
    val prev = lag(unix_micros(col(tsCol)), 1).over(w)
    val isNew = when(prev.isNull || us - prev > gapSec * 1000000L, 1L).otherwise(0L)
    df.withColumn("__brk", isNew)
      .withColumn("session_seq", sum(col("__brk")).over(w))
      .groupBy(col(userCol), col("session_seq"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        count_distinct(col(typeCol)).as("n_event_types"))
      .withColumn("duration_sec",
        ((unix_micros(col("session_end")) - unix_micros(col("session_start")))
          / lit(1000000L)).cast("long"))
  }

  /** Zero-filled daily activity grid: per-key event counts over EVERY day in
    * the observed range, missing (key, day) cells filled with 0 — the
    * resample/gap-fill primitive behind regular time-series features.
    *
    * Scale shape: the only data-sized pass is the keyed daily aggregation
    * (one shuffle). The day spine is generated from the 1-row min/max
    * aggregate (`sequence` + explode — days, not events), the key list is
    * the post-agg distinct, and the fill join runs small×small post-agg —
    * at 100 TB the grid is |keys|·|days|, never event-sized.
    */
  def gapFillDaily(df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    // persisted: the spine bounds, the key list, and the fill join all read
    // this grid-sized frame — without the persist each use re-runs the
    // event-sized aggregation (three full scans at 100 TB)
    val daily = df
      .groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n_events"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val spine = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
    val grid = daily.select(col(keyCol)).distinct().crossJoin(spine)
    grid.join(daily, Seq(keyCol, "day"), "left")
      .na.fill(0L, Seq("n_events"))
  }
}
