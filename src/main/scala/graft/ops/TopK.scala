package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Top-k helpers (declared surface: Ibis/Polars `top_k` / sort-limit;
  * reference: projects/feray/pyproject.toml:24-25).
  *
  * Global top-k compiles to `TakeOrderedAndProject` (no full sort, no full
  * shuffle — each partition keeps k, driver merges k*numPartitions).
  * Per-group top-k is a single keyed shuffle + streaming rank — at 100 TB
  * the partition key spreads groups across executors; no group must fit in
  * memory beyond its own rows.
  */
object TopK {

  /** Global top-k; `orderCols` should end with a unique tiebreak column so
    * results are deterministic under any partitioning. */
  def global(df: DataFrame, k: Int, orderCols: Seq[Column]): DataFrame =
    df.orderBy(orderCols: _*).limit(k)

  /** Top-k rows per group via row_number — ties broken by order columns,
    * which must therefore be total (include a unique id). */
  def perGroup(df: DataFrame, groupCols: Seq[String], orderCols: Seq[Column], k: Int,
               rankCol: String = "rk"): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(orderCols: _*)
    df.withColumn(rankCol, row_number().over(w)).where(col(rankCol) <= k)
  }
}
