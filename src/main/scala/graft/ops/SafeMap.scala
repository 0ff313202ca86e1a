package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Partial-failure-tolerant row transforms (reference semantics A2).
  *
  * The reference awaits Ray task results one at a time and segregates
  * successes from per-task errors so one bad element doesn't kill the job
  * (reference: examples/dagster_feray_example/defs/ray/ray_integration.py:24-34).
  * Spark tasks are all-or-nothing, so the equivalent contract is: errors are
  * DATA, not exceptions — every row yields `struct(ok, value, error)` and the
  * job always completes; callers split on `ok`.
  */
/** Row-level outcome carrier: errors travel as data. */
case class SafeResult[O](ok: Boolean, value: Option[O], error: Option[String])

object SafeMap {

  /** Wrap a scala function as a never-throwing UDF producing (ok, value, error). */
  def safeUdf[I, O](f: I => O)(implicit
      it: scala.reflect.runtime.universe.TypeTag[I],
      ot: scala.reflect.runtime.universe.TypeTag[O]): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((x: I) =>
      try SafeResult[O](ok = true, Option(f(x)), None)
      catch { case e: Throwable =>
        SafeResult[O](ok = false, None, Some(s"${e.getClass.getSimpleName}: ${e.getMessage}")) })

  /** Apply `valueExpr` guarded by `failsWhen`: rows matching the predicate get
    * ok=false + an error message instead of evaluating the expression (for
    * expressible guards this stays fully in codegen — no UDF). */
  def safeExpr(df: DataFrame, failsWhen: Column, error: Column, valueExpr: Column,
               outCol: String = "result"): DataFrame =
    df.withColumn(outCol, struct(
      (!failsWhen).as("ok"),
      when(failsWhen, lit(null)).otherwise(valueExpr).as("value"),
      when(failsWhen, error).as("error")))

  /** Split a safe-mapped frame into (successes, failures) on `outCol.ok`. */
  def split(df: DataFrame, outCol: String = "result"): (DataFrame, DataFrame) =
    (df.where(col(s"$outCol.ok")), df.where(!col(s"$outCol.ok")))
}
