package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality checks run post-materialization (reference: Dagster asset
  * checks, `dg.load_asset_checks_from_package_module`, definitions.py:32,48).
  *
  * A check is a named predicate over the materialized frame evaluated as ONE
  * aggregate — the runner bundles all checks of a feature into a single
  * `df.agg(...)` pass so N checks cost one job, not N.
  */
final case class Check(name: String, agg: Column, pass: Any => Boolean)

final case class CheckResult(name: String, passed: Boolean, observed: String)

object Checks {

  /** No nulls in `c`. */
  def notNull(c: String): Check =
    Check(s"not_null($c)", sum(when(col(c).isNull, 1L).otherwise(0L)),
      v => v.asInstanceOf[Long] == 0L)

  /** `keys` are unique (count == distinct count). */
  def unique(keys: Seq[String]): Check =
    Check(s"unique(${keys.mkString(",")})",
      (count(lit(1)) - countDistinct(col(keys.head), keys.tail.map(col): _*)).cast("long"),
      v => v.asInstanceOf[Long] == 0L)

  /** At least `n` rows. */
  def rowCountMin(n: Long): Check =
    Check(s"row_count_min($n)", count(lit(1)), v => v.asInstanceOf[Long] >= n)

  /** All values of `c` within [lo, hi]. */
  def inRange(c: String, lo: Double, hi: Double): Check =
    Check(s"in_range($c,$lo,$hi)",
      sum(when(col(c) < lo || col(c) > hi, 1L).otherwise(0L)),
      v => v.asInstanceOf[Long] == 0L)

  /** Run all checks in ONE aggregation pass. */
  def run(df: DataFrame, checks: Seq[Check]): Seq[CheckResult] = {
    if (checks.isEmpty) return Seq.empty
    val row = df.agg(checks.head.agg.as("c0"),
      checks.tail.zipWithIndex.map { case (c, i) => c.agg.as(s"c${i + 1}") }: _*).collect()(0)
    checks.zipWithIndex.map { case (c, i) =>
      val v = row.get(i)
      CheckResult(c.name, v != null && c.pass(v), String.valueOf(v))
    }
  }
}
