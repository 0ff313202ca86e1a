package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** As-of (point-in-time) join — the feature-store-critical operator.
  *
  * The reference declares this capability via its Polars dependency
  * (`join_asof`; reference: projects/feray/pyproject.toml:25) — point-in-time
  * correctness is what feature stores need when enriching entities with the
  * latest known state at a given time (reference README.md:21-23 record-level
  * versioning implies temporal lookups).
  *
  * Implementation is the scalable union-and-fill pattern, NOT a broadcast or
  * nested-loop join: tag both sides, union, ONE shuffle on (keys, ts), then a
  * running `last(..., ignoreNulls)` window carries the most recent right-side
  * row forward onto each left row. Cost is a single sort-shuffle of
  * |left|+|right| — at 100 TB this is the plan you want (an equi-join on key
  * with a range predicate would either explode or broadcast).
  *
  * The right payload travels as ONE struct filled by ONE window expression,
  * so the matched row is carried atomically: a NULL payload *value* on the
  * matched right row stays NULL instead of back-filling from an older right
  * row (per-column fills would splice columns from different source rows —
  * Polars/DuckDB asof attaches whole rows, and so do we). The struct itself
  * is never NULL on right rows, so `ignoreNulls` skips exactly the left rows.
  */
object AsOfJoin {

  /** Field name carrying the matched right timestamp inside the payload
    * struct (right payload columns keep their own names). */
  private val TsField = "__asof_rts"

  private def payloadType(right: DataFrame, rightCols: Seq[String], rightTs: String): StructType =
    StructType(
      rightCols.map(c => StructField(c, right.schema(c).dataType, nullable = true)) :+
        StructField(TsField, right.schema(rightTs).dataType, nullable = true))

  /** Backward as-of join: for each left row, attach the columns of the most
    * recent right row with `right.ts <= left.ts` for the same key.
    *
    * @param on        equi-key column names present on both sides
    * @param leftTs    event-time column on `left`
    * @param rightTs   event-time column on `right`
    * @param rightCols right-side payload columns to attach (aliased as-is)
    * @param toleranceMicros optional max staleness: matches older than
    *        leftTs - tolerance are nulled out (Polars `tolerance` parity)
    */
  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTs: String,
      rightTs: String,
      rightCols: Seq[String],
      toleranceMicros: Option[Long] = None): DataFrame =
    asofImpl(left, right, on, leftTs, rightTs, rightCols, toleranceMicros, forward = false)

  /** Forward as-of join (Polars `strategy="forward"` parity): for each left
    * row, attach the EARLIEST right row with `right.ts >= left.ts` for the
    * same key. Same single-shuffle union+window shape, with the window
    * looking forward and the tie sort flipped so an equal timestamp matches
    * (right sorts after left at ties under a descending-side scan). */
  def asofForward(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTs: String,
      rightTs: String,
      rightCols: Seq[String],
      toleranceMicros: Option[Long] = None): DataFrame =
    asofImpl(left, right, on, leftTs, rightTs, rightCols, toleranceMicros, forward = true)

  private def asofImpl(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTs: String,
      rightTs: String,
      rightCols: Seq[String],
      toleranceMicros: Option[Long],
      forward: Boolean): DataFrame = {

    val leftCols = left.columns.toSeq
    val tsCol = "__asof_ts"
    val sideCol = "__asof_side" // right = 0: at a timestamp tie the right row
                                // sorts before the left row in scan order on
                                // both directions → inclusive match (<= / >=)
    val payCol = "__asof_pay"
    val pType = payloadType(right, rightCols, rightTs)

    // Align both sides to a common schema: left payload ++ one right-payload
    // struct (NULL literal on left rows, whole-row struct on right rows).
    val l = left
      .withColumn(tsCol, col(leftTs))
      .withColumn(sideCol, lit(1))
      .select((Seq(col(tsCol), col(sideCol)) ++ on.map(col) ++
        leftCols.filterNot(on.contains).map(col) :+
        lit(null).cast(pType).as(payCol)): _*)
    val r = right
      .withColumn(tsCol, col(rightTs))
      .withColumn(sideCol, lit(0))
      .select((Seq(col(tsCol), col(sideCol)) ++ on.map(col) ++
        leftCols.filterNot(on.contains).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rightCols.map(col) :+ col(rightTs).as(TsField): _*).as(payCol)): _*)

    val unioned = l.unionByName(r)
    // Single sort-shuffle; the fill is a running window, no join blow-up.
    // Backward scans ts ASC (last right seen = most recent at-or-before);
    // forward scans ts DESC (last right seen = earliest at-or-after).
    val w = Window
      .partitionBy(on.map(col): _*)
      .orderBy(if (forward) col(tsCol).desc else col(tsCol).asc, col(sideCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = unioned
      .select((unioned.columns.map(col).toSeq :+
        last(col(payCol), ignoreNulls = true).over(w).as("__f")): _*)
      .where(col(sideCol) === 1)

    val fTs = col("__f").getField(TsField)
    val stale: Column = toleranceMicros match {
      case Some(tol) =>
        val age =
          if (forward) TimeCols.epochMicros(fTs) - TimeCols.epochMicros(col(tsCol))
          else TimeCols.epochMicros(col(tsCol)) - TimeCols.epochMicros(fTs)
        col("__f").isNull || age > tol
      case None => col("__f").isNull
    }

    filled.select((on.map(col) ++
      leftCols.filterNot(on.contains).map(col) ++
      rightCols.map(c => when(stale, lit(null)).otherwise(col("__f").getField(c)).as(c)) :+
      when(stale, lit(null)).otherwise(fTs).cast(right.schema(rightTs).dataType).as(s"matched_$rightTs")): _*)
  }
}
