package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Big-big interval/range joins (SURVEY §2.B "theta / non-equi": for big-big
  * range joins add a bucketized prefilter).
  *
  * Catalyst plans a pure non-equi join as BroadcastNestedLoop (or a
  * cartesian) — fine when one side broadcasts, catastrophic big-big. The
  * bucketized form turns it into an EQUI join: the right side explodes to
  * every coarse time bucket its interval covers, the left side keys on its
  * point's bucket, and the exact predicate runs as a residual filter on the
  * (small) per-bucket candidate set. Shuffle is keyed on the bucket id;
  * bucket width trades replication (wide intervals ÷ width) against
  * per-bucket fan-in.
  */
object RangeJoin {

  /** Join left rows (point `leftTs`) to right rows (interval
    * [`rightStart`, `rightEnd`], inclusive) with `point ∈ interval`
    * semantics, via `bucketWidthMicros` equi-buckets. */
  def bucketedIntervalJoin(
      left: DataFrame, leftTs: String,
      right: DataFrame, rightStart: String, rightEnd: String,
      bucketWidthMicros: Long,
      joinType: String = "inner"): DataFrame = {
    val l = left.withColumn("__bucket", floor(TimeCols.epochMicros(col(leftTs)) / bucketWidthMicros))
    val r = right.withColumn("__bucket",
      explode(sequence(
        floor(TimeCols.epochMicros(col(rightStart)) / bucketWidthMicros),
        floor(TimeCols.epochMicros(col(rightEnd)) / bucketWidthMicros))))
    l.join(r, Seq("__bucket"), joinType)
      .where(col(leftTs) >= col(rightStart) && col(leftTs) <= col(rightEnd))
      .drop("__bucket")
  }
}
