package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Feature flags / human-in-the-loop verification (reference design A15:
  * "feature flags/annotations with HITL verification", README.md:51-52).
  *
  * Review state is a system column — a plain predicate at query time, so
  * serving filters (`approvedOnly`) cost nothing beyond the scan filter and
  * push down to parquet like any other predicate.
  */
object Review {
  val StatusCol = "__review_status"
  val Pending = "pending"
  val Approved = "approved"
  val Rejected = "rejected"

  /** Stamp new records as pending review. */
  def stampPending(df: DataFrame): DataFrame =
    df.withColumn(StatusCol, lit(Pending))

  /** Apply a reviewer decision to the records matching `which`. */
  def decide(df: DataFrame, which: Column, status: String): DataFrame = {
    require(Seq(Pending, Approved, Rejected).contains(status))
    df.withColumn(StatusCol, when(which, lit(status)).otherwise(col(StatusCol)))
  }

  /** Serving-side gate: approved records only. */
  def approvedOnly(df: DataFrame): DataFrame = df.filter(col(StatusCol) === Approved)

  /** Review queue: pending records, oldest computed first when stamped. */
  def pendingQueue(df: DataFrame): DataFrame = df.filter(col(StatusCol) === Pending)

  /** One-pass review stats (for run reports / dashboards). */
  def stats(df: DataFrame): Map[String, Long] =
    df.groupBy(col(StatusCol)).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
}
